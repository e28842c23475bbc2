#!/usr/bin/env python
"""Per-kernel roofline measurement on the real TPU (VERDICT round-1 weak #2:
substantiate or achieve "speed-of-light" for the two hot kernels).

Measures achieved HBM GB/s and MXU TFLOP/s for

  * pht_and_s        — fused PHt = P @ Hd^T, S0 = Hd @ PHt (1 pass over P)
  * rank_k_update_rect — P += Xr^T Yc + Yr^T Xc            (read+write P)

at cap 1024..8192 (dim = 2*cap + 3 rounded), for both big-matmul precisions
(HIGHEST = 6-pass bf16 emulation, HIGH = 3-pass), Pallas vs pure-XLA.

Methodology: each sample is the MARGINAL time per kernel application
between a 2-iteration and an 8-iteration on-device chain (lax.scan with a
data dependence so iterations serialize), min-of-2, fresh seed inputs per
call (this stack caches identical dispatches; see PERF.md).

Usage:  python scripts/roofline_tpu.py [--dims 2051,4099,8195,16387]
Output: one table row per (kernel, dim, precision, impl) on stdout.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Peak numbers for the chip in this environment (TPU v5e / "v5 lite"):
HBM_GBPS = 819.0          # HBM bandwidth per chip
MXU_TFLOPS_BF16 = 197.0   # bf16 MXU peak per chip
# f32 via bf16 emulation: HIGHEST = 6 passes, HIGH = 3 passes of the MXU
# for one nominal f32 product.
PASSES = {"highest": 6, "high": 3}


def log(*a):
    print(*a, flush=True)


def build_loops():
    """Jitted loop runners.  Precision mode comes from the environment —
    run this script once per TPUSLAM_BIG_MATMUL_PRECISION value (inner-jit
    trace caches make in-process mode switching unreliable)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpuslam.kernels.pht_s import pht_and_s, pht_and_s_ref
    from tpuslam.kernels.sym_rank_k import (
        rank_k_update_rect,
        rank_k_update_rect_ref,
    )

    # `n` is a TRACED arg (lax.fori_loop trip count) so one executable per
    # (kernel, impl, dim, mode) serves every run size — the remote-compile
    # relay in this environment costs ~30-200 s per executable.
    @functools.partial(jax.jit, static_argnums=(4,))
    def loop_pht(P, Hd, seed, n, use_pallas):
        P = P + seed * 1e-30  # defeat the dispatch cache (cancels in diff)

        def body(_, carry):
            hd, acc = carry
            if use_pallas:
                PHt, S = pht_and_s(P, hd)
            else:
                PHt, S = pht_and_s_ref(P, hd)
            # Serialize iterations via a tiny data dependence on PHt.
            return hd + 1e-30 * PHt.T, acc + jnp.sum(S)

        hd, acc = lax.fori_loop(0, n, body, (Hd, jnp.zeros((), P.dtype)))
        return jnp.sum(hd[0]) + acc

    @functools.partial(jax.jit, static_argnums=(5,))
    def loop_rect(P, X, Y, seed, n, use_pallas):
        X = X + seed * 1e-30

        def body(_, p):
            if use_pallas:
                return rank_k_update_rect(p, X, Y, X, Y)
            return rank_k_update_rect_ref(p, X, Y, X, Y)

        p = lax.fori_loop(0, n, body, P)
        return jnp.sum(p[0])

    return loop_pht, loop_rect


def marginal_s(run, n1=4, n2=40):
    # float(...) forces a HOST TRANSFER: on this stack block_until_ready
    # alone under-synchronizes (CLAUDE.md), and the ~30-90 ms dispatch
    # jitter demands a wide n2-n1 window.
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
    ap.add_argument("--dims", default="2051,4099,8195,16387")
    ap.add_argument("--m2", type=int, default=64)
    args = ap.parse_args()
    dims = [int(d) for d in args.dims.split(",")]

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {dev.device_kind}")
    log(f"# peaks assumed: HBM {HBM_GBPS} GB/s, MXU {MXU_TFLOPS_BF16} "
        f"TFLOP/s bf16 ({PASSES['highest']}-pass HIGHEST / "
        f"{PASSES['high']}-pass HIGH for f32)")
    log("# kernel, dim, m2/k, precision, impl, ms, GB/s, %HBM-roofline, "
        "TFLOP/s(nominal), %compute-roofline, %combined-roofline")

    m2 = args.m2
    k = 2 * m2 + 8  # augment+downdate panel rows, padded

    mode = os.environ.get("TPUSLAM_BIG_MATMUL_PRECISION", "highest")
    if True:
        loop_pht, loop_rect = build_loops()
        passes = PASSES[mode]
        for dim in dims:
            key = jax.random.key(dim)
            k1, k2, k3 = jax.random.split(key, 3)
            A = jax.random.normal(k1, (dim, dim), jnp.float32) * 0.01
            P = (A @ A.T + jnp.eye(dim)) * 1e-3
            Hd = jax.random.normal(k2, (m2, dim), jnp.float32) * 1e-3
            X = jax.random.normal(k3, (k, dim), jnp.float32) * 1e-3
            Y = X * 1e-12  # keeps the P chain numerically stationary
            del A

            # ---- pht_and_s: flops = 2 dim^2 m2 (P@Hd^T) + 2 dim m2^2;
            #      bytes = dim^2 (read P) + small.
            fl_pht = 2.0 * dim * dim * m2 + 2.0 * dim * m2 * m2
            by_pht = 4.0 * dim * dim + 8.0 * dim * m2
            # ---- rect: flops = 4 dim^2 k; bytes = 2 dim^2 * 4 (r+w).
            fl_rect = 4.0 * dim * dim * k
            by_rect = 8.0 * dim * dim + 16.0 * dim * k

            for kernel, fl, by, mk in (
                ("pht_and_s", fl_pht, by_pht,
                 lambda n, s, up: loop_pht(P, Hd, s, n, up)),
                ("rank_k_rect", fl_rect, by_rect,
                 lambda n, s, up: loop_rect(P, X, Y, s, n, up)),
            ):
                for impl, up in (("pallas", True), ("xla", False)):
                    try:
                        t = marginal_s(
                            lambda n, s, _up=up, _mk=mk: _mk(n, s, _up)
                        )
                    except Exception as e:  # noqa: BLE001
                        log(f"{kernel}, {dim}, {m2 if 'pht' in kernel else k},"
                            f" {mode}, {impl}, FAILED: {type(e).__name__} {e}")
                        continue
                    gbps = by / t / 1e9
                    tfps = fl / t / 1e12
                    t_mem = by / (HBM_GBPS * 1e9)
                    t_cmp = fl * passes / (MXU_TFLOPS_BF16 * 1e12)
                    t_sol = max(t_mem, t_cmp)
                    log(f"{kernel}, {dim}, "
                        f"{m2 if 'pht' in kernel else k}, {mode}, {impl}, "
                        f"{t * 1e3:.3f}, {gbps:.0f}, "
                        f"{100 * t_mem / t:.0f}%, {tfps:.1f}, "
                        f"{100 * t_cmp / t:.0f}%, {100 * t_sol / t:.0f}%")


if __name__ == "__main__":
    sys.exit(main())
