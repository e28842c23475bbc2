#!/usr/bin/env python
"""rank_k kernel tuning on the real chip: block-size sweep x panel-concat
variant, HIGH precision, dim 8195/16387 (the sizes where Pallas is the
dispatched winner).  Measures marginal ms and GB/s vs the 2-pass minimum
traffic; prints one JSON line per point."""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_concat_kernel(dim, block, presplit):
    """Variant kernel: out = P + A_i^T B_j with pre-concatenated panels.
    presplit: hi/lo bf16 panels are built OUTSIDE (once), the kernel does
    3 bf16 dots — no per-tile splitting."""
    if presplit:
        def kern(p_ref, ah_ref, al_ref, bh_ref, bl_ref, out_ref):
            d = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = (d(ah_ref[:], bh_ref[:]) + d(al_ref[:], bh_ref[:])
                   + d(ah_ref[:], bl_ref[:]))
            out_ref[:] = (p_ref[:].astype(jnp.float32) + acc).astype(
                out_ref.dtype)
        return kern

    def kern(p_ref, a_ref, b_ref, out_ref):
        from tpuslam.kernels.mm import dot_general_3pass

        acc = dot_general_3pass(a_ref[:], b_ref[:],
                                (((0,), (0,)), ((), ())))
        out_ref[:] = (p_ref[:].astype(jnp.float32) + acc).astype(
            out_ref.dtype)
    return kern


def concat_rank_k(P, A, B, *, block, presplit):
    R, C = P.shape
    k = A.shape[0]
    nbr, nbc = pl.cdiv(R, block), pl.cdiv(C, block)
    pspec = pl.BlockSpec((block, block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((k, block), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((k, block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
    if presplit:
        ah = A.astype(jnp.bfloat16)
        al = (A - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = B.astype(jnp.bfloat16)
        bl = (B - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return pl.pallas_call(
            make_concat_kernel(max(R, C), block, True),
            out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
            grid_spec=pl.GridSpec(
                grid=(nbr, nbc),
                in_specs=[pspec, aspec, bspec, aspec, bspec][:1]
                + [aspec, aspec, bspec, bspec],
                out_specs=pspec,
            ),
            input_output_aliases={0: 0},
        )(P, ah, al, bh, bl)
    return pl.pallas_call(
        make_concat_kernel(max(R, C), block, False),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        grid_spec=pl.GridSpec(
            grid=(nbr, nbc), in_specs=[pspec, aspec, bspec],
            out_specs=pspec,
        ),
        input_output_aliases={0: 0},
    )(P, A, B)


def main():
    os.environ.setdefault("TPUSLAM_BIG_MATMUL_PRECISION", "high")
    from tpuslam.kernels.sym_rank_k import rank_k_update_rect
    from tpuslam.utils.profiling import marginal_ms

    dev = jax.devices()[0]
    print(json.dumps({"stage": "env", "kind": dev.device_kind}), flush=True)
    rng = np.random.default_rng(0)
    for dim in (8195, 16387):
        m2 = 96
        k = 2 * m2  # current kernel's two (k=136ish) dots ~ one 2k dot
        P0 = jnp.asarray(rng.standard_normal((dim, dim)), jnp.float32)
        Xr = jnp.asarray(rng.standard_normal((k // 2, dim)), jnp.float32)
        Yr = jnp.asarray(rng.standard_normal((k // 2, dim)), jnp.float32)
        A = jnp.concatenate([Xr, Yr], 0)
        B = jnp.concatenate([Yr, Xr], 0)
        bytes2 = 2 * dim * dim * 4

        def run_current(n, seed, block):
            P = P0 * (1.0 + seed * 1e-6)
            for _ in range(n):
                P = rank_k_update_rect(P, Xr, Yr, Xr, Yr, block=block)
            jax.block_until_ready(P)
            np.asarray(P[0, 0])

        def run_concat(n, seed, block, presplit):
            P = P0 * (1.0 + seed * 1e-6)
            for _ in range(n):
                P = concat_rank_k(P, A, B, block=block, presplit=presplit)
            jax.block_until_ready(P)
            np.asarray(P[0, 0])

        for block in (512, 1024, 2048):
            try:
                ms = marginal_ms(
                    functools.partial(run_current, block=block), 2, 6) / 4
                print(json.dumps({
                    "variant": "current", "dim": dim, "block": block,
                    "ms": round(ms, 3),
                    "gbps": round(bytes2 / ms / 1e6, 0),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"variant": "current", "dim": dim,
                                  "block": block,
                                  "error": str(e)[:120]}), flush=True)
            for presplit in (False, True):
                try:
                    ms = marginal_ms(
                        functools.partial(run_concat, block=block,
                                          presplit=presplit), 2, 6) / 4
                    print(json.dumps({
                        "variant": ("concat-presplit" if presplit
                                    else "concat"),
                        "dim": dim, "block": block, "ms": round(ms, 3),
                        "gbps": round(bytes2 / ms / 1e6, 0),
                    }), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "variant": ("concat-presplit" if presplit
                                    else "concat"), "dim": dim,
                        "block": block, "error": str(e)[:120]}),
                        flush=True)


if __name__ == "__main__":
    main()
