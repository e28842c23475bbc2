#!/usr/bin/env python
"""Diagnose the rank_k kernel's missing DMA/MXU overlap (real chip).

Block-shape tuning is exhausted (scripts/rank_k_tune_tpu.py): per-tile
time ~= t_mem + t_compute, i.e. the pipeline is serialized.  This probes
WHY by ablating one factor at a time at dim 16387, block 512:

  * high     — the production 3-pass kernel (baseline, ~5.06 ms);
  * default  — 1-pass bf16 dots (cuts MXU work 3x: if time falls by
               ~t_compute the pipeline is serial; if it stays ~memory-
               bound the DMA was already the critical path);
  * noalias  — same kernel without input_output_aliases (does aliasing
               serialize the DMA queue?);
  * parallel — dimension_semantics=("parallel","parallel") compiler hint.

Same fori_loop marginal methodology as scripts/roofline_tpu.py.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0


def marginal_s(run, n1=4, n2=40):
    float(run(n1, 1000.0))
    float(run(n2, 1001.0))

    def best(n, s0):
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(n, s0 + i))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(n2, 1.0) - best(n1, 100.0)) / (n2 - n1)


def build(variant, dim, k, block=512):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpuslam.kernels.mm import dot_general_3pass

    dims = (((0,), (0,)), ((), ()))
    catpanel = variant.startswith("cat")

    if catpanel:
        # One deep dot per pass: acc = [Xi;Yi]^T [Yj;Xj], contraction
        # depth 2k — the concatenation happens OUTSIDE, so the kernel has
        # 2 panel refs instead of 4 and one MXU op per pass.
        def kern(p_ref, a_ref, b_ref, out_ref):
            acc = dot_general_3pass(a_ref[:], b_ref[:], dims)
            out_ref[:] = (p_ref[:].astype(jnp.float32) + acc).astype(
                out_ref.dtype)
    else:
        def kern(p_ref, xi_ref, yj_ref, yi_ref, xj_ref, out_ref):
            if variant == "default":
                d = functools.partial(lax.dot_general,
                                      dimension_numbers=dims,
                                      preferred_element_type=jnp.float32)
                acc = d(xi_ref[:], yj_ref[:]) + d(yi_ref[:], xj_ref[:])
            else:
                acc = (dot_general_3pass(xi_ref[:], yj_ref[:], dims)
                       + dot_general_3pass(yi_ref[:], xj_ref[:], dims))
            out_ref[:] = (p_ref[:].astype(jnp.float32) + acc).astype(
                out_ref.dtype)

    nb = pl.cdiv(dim, block)
    pspec = pl.BlockSpec((block, block), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    kk = 2 * k if catpanel else k
    rspec = pl.BlockSpec((kk, block), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((kk, block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
    kwargs = {}
    if variant != "noalias":
        kwargs["input_output_aliases"] = {0: 0}
    if "parallel" in variant:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    if variant == "vmem64":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)

    def call(P, X, Y):
        if catpanel:
            A = jnp.concatenate([X, Y], 0)
            B = jnp.concatenate([Y, X], 0)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
                grid_spec=pl.GridSpec(
                    grid=(nb, nb),
                    in_specs=[pspec, rspec, cspec],
                    out_specs=pspec,
                ),
                **kwargs,
            )(P, A, B)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
            grid_spec=pl.GridSpec(
                grid=(nb, nb),
                in_specs=[pspec, rspec, cspec, rspec, cspec],
                out_specs=pspec,
            ),
            **kwargs,
        )(P, X, Y, Y, X)

    @jax.jit
    def loop(P, X, Y, seed, n):
        X = X + seed * 1e-30

        def body(_, p):
            return call(p, X, Y)

        return jnp.sum(lax.fori_loop(0, n, body, P)[0])

    return loop


def main():
    os.environ.setdefault("TPUSLAM_BIG_MATMUL_PRECISION", "high")
    import jax
    import jax.numpy as jnp

    dim, m2 = 16387, 64
    k = 2 * m2 + 8
    print(json.dumps({"stage": "env",
                      "kind": jax.devices()[0].device_kind}), flush=True)
    key = jax.random.key(dim)
    k1, k3 = jax.random.split(key)
    A = jax.random.normal(k1, (dim, dim), jnp.float32) * 0.01
    P = (A @ A.T + jnp.eye(dim)) * 1e-3
    del A
    X = jax.random.normal(k3, (k, dim), jnp.float32) * 1e-3
    Y = X * 1e-12
    by = 8.0 * dim * dim + 16.0 * dim * k

    variants = sys.argv[1:] or ["parallel", "cat", "cat_parallel", "vmem64"]
    for variant in variants:
        try:
            loop = build(variant, dim, k)
            t = marginal_s(lambda n, s, _l=loop: _l(P, X, Y, s, n))
            print(json.dumps({
                "variant": variant, "dim": dim, "ms": round(t * 1e3, 3),
                "gbps": round(by / t / 1e9, 0),
                "pct_hbm": round(100 * by / (HBM_GBPS * 1e9) / t, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": variant,
                              "error": str(e)[:140]}), flush=True)


if __name__ == "__main__":
    main()
