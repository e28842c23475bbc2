#!/usr/bin/env python
"""rank_k kernel tuning on the real chip (PERF.md "remaining headroom").

Sweeps the VMEM tile shape (square + rectangular) of
`rank_k_update_rect` and a pre-split-panel variant at the dims where the
Pallas kernel is the dispatched winner (8195/16387 = cap 4096/8192).

Methodology — identical to scripts/roofline_tpu.py (the numbers PERF.md
trusts): each sample is the MARGINAL time per kernel application between
an n1- and an n2-iteration on-device `lax.fori_loop` chain (traced trip
count, one executable; data dependence serializes iterations), min-of-3,
fresh seed per call.  A Python-loop chain is NOT usable here: its
(n2-n1) * ~1.7 ms window is inside the tunnel's 30-90 ms dispatch-
overhead variance and produced >HBM-peak "measurements".

Usage: python scripts/rank_k_tune_tpu.py [--dims 8195,16387]
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="8195,16387")
    ap.add_argument("--m2", type=int, default=64)
    args = ap.parse_args()
    os.environ.setdefault("TPUSLAM_BIG_MATMUL_PRECISION", "high")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpuslam.kernels.sym_rank_k import rank_k_update_rect

    dev = jax.devices()[0]
    print(json.dumps({"stage": "env", "kind": dev.device_kind,
                      "mode": os.environ["TPUSLAM_BIG_MATMUL_PRECISION"]}),
          flush=True)

    k = 2 * args.m2 + 8

    @functools.partial(jax.jit, static_argnums=(4,))
    def loop_rect(P, X, Y, seed, block, n):
        X = X + seed * 1e-30

        def body(_, p):
            return rank_k_update_rect(p, X, Y, X, Y, block=block)

        return jnp.sum(lax.fori_loop(0, n, body, P)[0])

    for dim in [int(d) for d in args.dims.split(",")]:
        key = jax.random.key(dim)
        k1, k3 = jax.random.split(key)
        A = jax.random.normal(k1, (dim, dim), jnp.float32) * 0.01
        P = (A @ A.T + jnp.eye(dim)) * 1e-3
        del A
        X = jax.random.normal(k3, (k, dim), jnp.float32) * 1e-3
        Y = X * 1e-12  # keeps the P chain numerically stationary
        by = 8.0 * dim * dim + 16.0 * dim * k

        # Taller tiles cut the per-tile column-panel reload traffic
        # (ratio K/(2*br) of the P bytes): with the cat-panel kernel the
        # reload is the remaining gap to the 2-pass roofline.
        for block in (512, (768, 512), (1024, 512), (1024, 256),
                      (512, 1024)):
            try:
                t = marginal_s(
                    lambda n, s, _b=block: loop_rect(P, X, Y, s, _b, n))
                print(json.dumps({
                    "variant": "rect", "dim": dim, "block": block,
                    "ms": round(t * 1e3, 3),
                    "gbps": round(by / t / 1e9, 0),
                    "pct_hbm": round(100 * by / (HBM_GBPS * 1e9) / t, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": "rect", "dim": dim,
                                  "block": block,
                                  "error": str(e)[:140]}), flush=True)


if __name__ == "__main__":
    main()
