"""Pallas TPU kernel: symmetric block rank-k covariance update

    P' = P + X^T Y + Y^T X,    P (dim, dim),  X, Y (k, dim) thin panels.

This is the single op through which ALL of an epoch's covariance evolution
flows in the fused EKF path (filters/ekf_fused.py: accumulated predict +
Kalman downdate + augmentation panels).  The XLA formulation materializes
Delta = X^T Y (one dim^2 buffer) plus a transposed read — ~4 full passes
over HBM; this kernel streams P block-by-block through VMEM once, computing
both small matmuls per tile on the MXU: 1 read + 1 write of P, panels
resident.

Also used by the sharded engine: each shard calls it on its local row block
of Pmm with the corresponding panel slices (the update is elementwise in
block rows).
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


def _make_rect_kernel(dim: int):
    def _kernel(p_ref, a_ref, b_ref, out_ref):
        # out = P + A_i^T @ B_j for this (i, j) tile, with the panels
        # pre-concatenated OUTSIDE as A = [X; Y], B = [Y; X] — ONE deep
        # dot per emulation pass instead of two half-depth ones.  Measured
        # 1.27x over the two-dot form at dim 16387 (5.07 -> 3.99 ms,
        # scripts/rank_k_overlap_tpu.py): fewer MXU invocations at double
        # contraction depth, and half the per-tile bf16 split work.
        # P may be stored in a reduced dtype (fp16 map blocks for the
        # 100k-landmark memory budget); the accumulation always runs in
        # f32 and the result is rounded back to storage dtype on write.
        from tpuslam.kernels.mm import dot_general_prec

        prec = big_matmul_precision(dim)
        dims = (((0,), (0,)), ((), ()))
        acc = dot_general_prec(a_ref[:], b_ref[:], dims, prec)
        out_ref[:] = (p_ref[:].astype(jnp.float32) + acc).astype(
            out_ref.dtype
        )

    return _kernel


def _pad_panels(X, Y):
    """Pad the panel row count to a sublane multiple (zero rows are exact
    no-ops in the rank-k sum)."""
    k = X.shape[0]
    k_pad = ((k + 7) // 8) * 8
    if k_pad != k:
        pad = ((0, k_pad - k), (0, 0))
        X = jnp.pad(X, pad)
        Y = jnp.pad(Y, pad)
    return X, Y


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def rank_k_update_rect(P, Xr, Yr, Xc, Yc, *, block=(768, 512),
                       interpret: bool = False):
    """Rectangular form:  P + Xr^T Yc + Yr^T Xc  in one pass over P.

    Shapes: P (R, C); Xr, Yr (k, R) row-side panels; Xc, Yc (k, C)
    column-side panels.  This is the per-shard op of the distributed
    engine: each shard updates its row block of the landmark covariance
    with its panel row-slices against the full column panels.

    `block` is the VMEM tile shape: an int (square tile) or a
    (block_rows, block_cols) pair — rectangular tiles trade sublane depth
    for lane width (wider tiles amortize the per-tile column-panel reload
    over more P bytes; see scripts/rank_k_tune_tpu.py measurements).
    """
    R, C = P.shape
    Xr, Yr = _pad_panels(Xr, Yr)
    Xc, Yc = _pad_panels(Xc, Yc)
    # Concatenated panels: A^T B = Xr^T Yc + Yr^T Xc in one deep dot.
    A = jnp.concatenate([Xr, Yr], 0)
    B = jnp.concatenate([Yc, Xc], 0)
    k2 = A.shape[0]
    br, bc = (block, block) if isinstance(block, int) else block
    nbr = pl.cdiv(R, br)
    nbc = pl.cdiv(C, bc)

    grid_spec = pl.GridSpec(
        grid=(nbr, nbc),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, br), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),      # A tile (rows)
            pl.BlockSpec((k2, bc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),      # B tile (cols)
        ],
        out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_rect_kernel(max(R, C)),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        grid_spec=grid_spec,
        # In-place: each (i, j) tile is read once and written once at the
        # same position, so P can alias the output — halves peak HBM for
        # the epoch's dominant buffer (P is the working set; this is what
        # lets a 1-chip demo hold a ~10 GB covariance).
        input_output_aliases={0: 0},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * C * k2,
            bytes_accessed=2 * R * C * 4 + k2 * (R + C) * 4,
            transcendentals=0,
        ),
    )(P, A, B)


def rank_k_update_rect_ref(P, Xr, Yr, Xc, Yc):
    prec = big_matmul_precision(max(P.shape))
    if P.dtype == jnp.float16 and P.shape[0] >= 4096:
        # fp16-stored P takes this XLA path at every size (Mosaic cannot
        # lower f16), and the unchunked form materializes the full f32
        # delta — 2x the fp16 map buffer, an OOM at cap >= 24576.  Walk
        # P in row blocks via an aliased fori carry: peak extra memory is
        # one (block, cap2) f32 delta instead of (rows, cap2).  Block
        # must divide rows exactly (an overlapping tail chunk would
        # re-add rows already updated in the carry).
        rows = P.shape[0]
        blk = next((b for b in (4096, 3072, 2048, 1536, 1024, 512, 256)
                    if rows % b == 0), None)
        if blk is not None and blk < rows:
            k = Xr.shape[0]

            def body(i, Pacc):
                r0 = i * blk
                xr = jax.lax.dynamic_slice(Xr, (0, r0), (k, blk))
                yr = jax.lax.dynamic_slice(Yr, (0, r0), (k, blk))
                pb = jax.lax.dynamic_slice(Pacc, (r0, 0),
                                           (blk, P.shape[1]))
                acc = (jnp.matmul(xr.T, Yc, precision=prec)
                       + jnp.matmul(yr.T, Xc, precision=prec))
                nb = (pb.astype(acc.dtype) + acc).astype(P.dtype)
                return jax.lax.dynamic_update_slice(Pacc, nb, (r0, 0))

            return jax.lax.fori_loop(0, rows // blk, body, P)
    acc = (jnp.matmul(Xr.T, Yc, precision=prec)
           + jnp.matmul(Yr.T, Xc, precision=prec))
    return (P.astype(acc.dtype) + acc).astype(P.dtype)


def symmetric_rank_k_update(P, X, Y, *, block=(768, 512),
                            interpret: bool = False):
    """P + X^T Y + Y^T X via one pass over P.  Shapes: P (dim, dim) f32;
    X, Y (k, dim).  dim need not divide `block` (Mosaic masks edge tiles)."""
    return rank_k_update_rect(P, X, Y, X, Y, block=block,
                              interpret=interpret)


def symmetric_rank_k_update_ref(P, X, Y):
    """Pure-XLA reference (used on CPU and for equivalence tests)."""
    Delta = jnp.matmul(X.T, Y, precision=big_matmul_precision(P.shape[0]))
    return P + Delta + Delta.T
