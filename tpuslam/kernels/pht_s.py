"""Pallas TPU kernel: fused innovation-covariance products

    PHt = P @ Hd^T            (dim, m2)
    S0  = Hd @ PHt            (m2, m2)

in ONE streaming pass over P (the XLA formulation runs two dependent
matmuls, each re-reading P-sized data).  The grid tiles P in 2-D
(row-major, columns inner): each row band accumulates its PHt rows across
column tiles in VMEM scratch; when a band completes, its PHt rows are
emitted and folded into the S0 accumulator, flushed on the last band.
2-D tiling keeps VMEM usage independent of dim (the 1-D full-width-row
variant ran out of VMEM beyond dim ~4k).

Hd is the densified sparse observation Jacobian (filters/ekf.py:_dense_H);
m2 = 2 * max_nz is small, so Hd tiles and S0 live comfortably in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.kernels.dispatch import big_matmul_precision

_HI = lax.Precision.HIGHEST


def _make_kernel(dim: int, block: int):
    def kernel(p_ref, hdT_ref, hdcols_ref, pht_ref, s_ref,
               acc_pht_ref, acc_s_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nb_r = pl.num_programs(0)
        nb_c = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc_pht_ref[:] = jnp.zeros_like(acc_pht_ref)

        # Mask ragged tiles: padded P columns / Hd^T rows are garbage —
        # zero BOTH sides so padded products vanish.
        col = j * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        p_m = jnp.where(col < dim, p_ref[:], 0.0)
        hdT_m = jnp.where(col.T < dim, hdT_ref[:], 0.0)
        from tpuslam.kernels.mm import dot_general_prec

        acc_pht_ref[:] += dot_general_prec(
            p_m, hdT_m, (((1,), (0,)), ((), ())),
            big_matmul_precision(dim),
        )

        @pl.when(j == nb_c - 1)
        def _():
            pht = acc_pht_ref[:]
            pht_ref[:] = pht

            @pl.when(i == 0)
            def _():
                acc_s_ref[:] = jnp.zeros_like(acc_s_ref)

            row = i * block + jax.lax.broadcasted_iota(
                jnp.int32, (block, 1), 0
            )
            pht_m = jnp.where(row < dim, pht, 0.0)
            hdc_m = jnp.where(row.T < dim, hdcols_ref[:], 0.0)
            acc_s_ref[:] += jax.lax.dot_general(
                hdc_m, pht_m,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HI,
            )

            @pl.when(i == nb_r - 1)
            def _():
                s_ref[:] = acc_s_ref[:]

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
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),      # P tile
            pl.BlockSpec((block, m2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),      # Hd^T row band
            pl.BlockSpec((m2, block), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),      # Hd column slice
        ],
        out_specs=[
            pl.BlockSpec((block, m2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, m2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, m2), jnp.float32),
            pltpu.VMEM((m2, m2), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * dim * dim * m2 + 2 * dim * m2 * m2,
            bytes_accessed=dim * dim * 4 + 2 * dim * m2 * 4,
            transcendentals=0,
        ),
    )(P, Hd.T, Hd)


def pht_and_s_ref(P, Hd):
    """Pure-XLA reference."""
    PHt = jnp.matmul(P, Hd.T, precision=big_matmul_precision(P.shape[0]))
    return PHt, jnp.matmul(Hd, PHt, precision=_HI)
