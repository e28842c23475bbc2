"""Pallas TPU kernel: fused innovation-covariance products

    PHt = P @ Hd^T            (dim, m2)
    S0  = Hd @ PHt            (m2, m2)

in ONE streaming pass over P (the XLA formulation runs two dependent
matmuls, each re-reading P-sized data).  The grid walks row blocks of P;
each step emits its PHt rows and accumulates its contribution to S0 in a
VMEM scratch, flushed on the last step.

Hd is the densified sparse observation Jacobian (filters/ekf.py:_dense_H);
m2 = 2 * max_nz is small (<= a few hundred), so Hd and S0 live in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = lax.Precision.HIGHEST


def _make_kernel(dim: int, block: int):
    def kernel(p_ref, hdT_ref, hdcols_ref, pht_ref, s_ref, acc_ref):
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        pht = jax.lax.dot_general(
            p_ref[:], hdT_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HI,
        )                                          # (block, m2)
        pht_ref[:] = pht

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Mask the ragged last block: padded P rows AND padded Hd columns
        # are garbage (NaN in interpret mode) — zero both sides so the
        # padded products vanish instead of poisoning the S accumulation.
        row = i * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, 1), 0
        )
        pht_m = jnp.where(row < dim, pht, 0.0)
        col = i * block + jax.lax.broadcasted_iota(
            jnp.int32, (1, block), 1
        )
        hdcols_m = jnp.where(col < dim, hdcols_ref[:], 0.0)
        acc_ref[:] += jax.lax.dot_general(
            hdcols_m, pht_m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HI,
        )                                          # (m2, m2)

        @pl.when(i == nb - 1)
        def _():
            s_ref[:] = acc_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pht_and_s(P, Hd, *, block: int = 512, interpret: bool = False):
    """Returns (PHt, S0) for dense P (dim, dim) and Hd (m2, dim)."""
    dim = P.shape[0]
    m2 = Hd.shape[0]
    nb = pl.cdiv(dim, block)

    return pl.pallas_call(
        _make_kernel(dim, block),
        out_shape=[
            jax.ShapeDtypeStruct((dim, m2), P.dtype),
            jax.ShapeDtypeStruct((m2, m2), P.dtype),
        ],
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # P row block
            pl.BlockSpec((dim, m2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # Hd^T (resident)
            pl.BlockSpec((m2, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),      # Hd column slice
        ],
        out_specs=[
            pl.BlockSpec((block, m2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, m2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((m2, m2), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * dim * dim * m2 + 2 * dim * m2 * m2,
            bytes_accessed=dim * dim * 4 + 2 * dim * m2 * 4,
            transcendentals=0,
        ),
    )(P, Hd.T, Hd)


def pht_and_s_ref(P, Hd):
    """Pure-XLA reference."""
    PHt = jnp.matmul(P, Hd.T, precision=_HI)
    return PHt, jnp.matmul(Hd, PHt, precision=_HI)
