#!/usr/bin/env python
"""Accuracy validation of the big-matmul precision policy at cap 4096
(VERDICT round-1 next-step #2).

The fused epoch has exactly two dim^2-sized products (P @ Hd^T and the
rank-k panel update).  On TPU, f32 matmuls are emulated in bf16 passes:
HIGHEST = 6 passes, HIGH = 3.  kernels/dispatch defaults to 'auto' (HIGH at
dim >= 4096); this script substantiates that choice by running the SAME
closed loop (config-2 scene, 1000 landmarks, cap 4096 => dim 8195, 310
epochs = full course) in four modes on an identical pregenerated noise
stream:

    cpu64        engine on CPU float64      — the spec ground truth
                 (engine == NumPy oracle to 1e-6, tests/test_sim_golden.py)
    cpu32        engine on CPU float32      — isolates f32 rounding
    tpu-highest  f32 on chip, 6-pass matmuls
    tpu-high     f32 on chip, 3-pass matmuls

and comparing ATE, landmark counts, and trajectory divergence.  Acceptance:
the tpu-high vs tpu-highest divergence is no worse than the f32-vs-f64
divergence already accepted for the engine, and ATE/landmark counts agree.

Run:  for m in cpu64 cpu32 tpu-highest tpu-high; do
          python scripts/validate_precision_tpu.py --mode $m
      done
      python scripts/validate_precision_tpu.py --compare
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/tpuslam_precval"
MODES = ("cpu64", "cpu32", "tpu-highest", "tpu-high")


def log(*a):
    print(*a, flush=True)


def run_mode(mode: str, n_epochs: int, cap: int):
    if mode.startswith("tpu-"):
        os.environ["TPUSLAM_BIG_MATMUL_PRECISION"] = mode.split("-", 1)[1]
    import jax

    if mode.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
        if mode == "cpu64":
            jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.sim.scene import make_grid_course, make_landmarks
    from tpuslam.sim.simulator import (
        draw_noise_arrays,
        init_sim_state,
        run_epochs,
    )

    dtype = jnp.float64 if mode == "cpu64" else jnp.float32
    scene = SceneConfig(
        xmin=0.0, xmax=300.0, ymin=0.0, ymax=300.0,
        n_landmarks=1000, legacy_integer_landmarks=False,
    )
    cfg = SimConfig(scene=scene, capacity=cap, max_obs=48)
    wp = make_grid_course(300.0, n_per_side=6, inset=0.1)
    lm = make_landmarks(scene, seed=4)
    noises = draw_noise_arrays(cfg, n_epochs, scene.n_landmarks, seed=42)

    dev = jax.devices()[0]
    log(f"[{mode}] device {dev.platform} {dev.device_kind}, dtype {dtype}, "
        f"cap {cap}, {n_epochs} epochs")
    st0 = init_sim_state(cfg, jnp.asarray(wp, dtype), dtype=dtype)
    t0 = time.time()
    st, recs = jax.block_until_ready(run_epochs(
        cfg, jnp.asarray(wp, dtype), jnp.asarray(lm, dtype), st0,
        tuple(jnp.asarray(n, dtype) for n in noises),
    ))
    log(f"[{mode}] run {time.time() - t0:.1f}s; n={int(st.ekf.n)}")

    n = int(st.ekf.n)
    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez(
        os.path.join(OUT_DIR, f"{mode}.npz"),
        true_pose=np.asarray(recs.true_pose, np.float64),
        slam_pose=np.asarray(recs.slam_pose, np.float64),
        active=np.asarray(recs.active),
        x_head=np.asarray(st.ekf.x[:3 + 2 * n], np.float64),
        n=n,
        landmarks=np.asarray(lm, np.float64),
    )
    log(f"[{mode}] saved")


def compare():
    from tpuslam.bench.metrics import ate_rmse, map_quality

    data = {}
    for m in MODES:
        p = os.path.join(OUT_DIR, f"{m}.npz")
        if not os.path.exists(p):
            log(f"missing {p} — run --mode {m} first")
            return 1
        data[m] = np.load(p)

    def track(d):
        a = d["active"].reshape(-1)
        return (d["true_pose"].reshape(-1, 3)[a],
                d["slam_pose"].reshape(-1, 3)[a])

    log("mode, ATE [m], n_landmarks, duplicates, matched_rmse [m]")
    for m in MODES:
        t, s = track(data[m])
        n = int(data[m]["n"])
        est = data[m]["x_head"][3:].reshape(-1, 2)
        mq = map_quality(est, data[m]["landmarks"])
        log(f"{m}, {ate_rmse(s, t):.4f}, {n}, {mq['n_duplicates']}, "
            f"{mq['matched_rmse']:.4f}")

    def div(a, b):
        _, sa = track(data[a])
        _, sb = track(data[b])
        k = min(len(sa), len(sb))
        d = np.linalg.norm(sa[:k, :2] - sb[:k, :2], axis=1)
        return d.max(), d.mean()

    log("\npair, max xy divergence [m], mean [m]")
    for a, b in (("cpu32", "cpu64"), ("tpu-highest", "cpu64"),
                 ("tpu-high", "cpu64"), ("tpu-high", "tpu-highest")):
        mx, mn = div(a, b)
        log(f"{a} vs {b}, {mx:.4f}, {mn:.4f}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=MODES)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--epochs", type=int, default=310)
    ap.add_argument("--cap", type=int, default=4096)
    args = ap.parse_args()
    if args.compare:
        return compare()
    if not args.mode:
        log("need --mode or --compare")
        return 2
    run_mode(args.mode, args.epochs, args.cap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
