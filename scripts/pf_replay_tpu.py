#!/usr/bin/env python
"""Chip-vs-CPU FastSLAM paired-state replay study (VERDICT r4 task 3).

The r4 12-seed study's open finding: chip 100-particle ATE stochastically
dominates CPU ATE (chip min > CPU max, p ~ 1/6188) at identical code and
random streams — but those runs were UNPAIRED (truth + observations are
generated on-device, so the platforms run different realizations after
the first divergent ulp).  This study removes the confound with
sim/pf_replay.py: one CPU-generated tape per seed (controls,
observations, truth, per-tick keys as data), replayed by the pure filter
recursion on BOTH platforms from the same initial state.

Phase 1 (paired): per seed, full-course replay on CPU and chip — paired
ATE / map-quality deltas.  If the chip matches CPU here, the r4 gap was
the generation confound; if not, phase 2 localizes it.

Phase 2 (windows): from CPU mid-run snapshots every M epochs, advance
BOTH platforms M epochs on the same tape slice; compare end-of-window
estimates, effective sample size, resample decisions, map sizes — where
the statistics first part is the mechanism.

Usage: python scripts/pf_replay_tpu.py [n_seeds] [n_particles]
       [--windows M] [--cpu-only]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _stats(tape, pf, rec, lm, jax, np):
    from tpuslam.bench.metrics import ate_rmse, map_quality

    act = np.asarray(tape.active[:, -1])
    est = np.asarray(rec.est_pose)[act]
    tru = np.asarray(tape.true_pose)[act]
    best = int(np.argmax(np.asarray(pf.logw)))
    nb = int(np.asarray(pf.n)[best])
    mq = map_quality(np.asarray(pf.fm)[best, :nb], lm)
    return {
        "ate": round(float(ate_rmse(est, tru)), 3),
        "n": nb,
        "spurious": int(mq["n_spurious"]),
        "coverage": round(float(mq["coverage"]), 3),
        "neff_med": round(float(np.median(np.asarray(rec.neff)[act])), 1),
        "resample_frac": round(float(np.asarray(rec.resampled)[act].mean()),
                               3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_seeds", nargs="?", type=int, default=8)
    ap.add_argument("n_particles", nargs="?", type=int, default=100)
    ap.add_argument("--windows", type=int, default=0,
                    help="phase-2 window length M (0 = skip phase 2)")
    ap.add_argument("--win-seed", type=int, default=0)
    ap.add_argument("--cpu-only", action="store_true")
    ap.add_argument("--epochs", type=int, default=1100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuslam.config import course1_config
    from tpuslam.filters.fastslam import make_pf_state
    from tpuslam.core.geometry import initial_pose
    from tpuslam.sim.pf_replay import make_tape, run_replay
    from tpuslam.sim.scene import load_course, make_landmarks

    cpu = jax.devices("cpu")[0]
    dev = None
    if not args.cpu_only:
        for d in jax.devices():
            if d.platform != "cpu":
                dev = d
                break
    print(json.dumps({"stage": "env",
                      "chip": str(dev) if dev else "none"}), flush=True)

    cfg = course1_config(n_landmarks=35, capacity=64, max_obs=48)
    lm35 = make_landmarks(cfg.scene, seed=3)
    with jax.default_device(cpu):
        wp = jnp.asarray(load_course(), jnp.float32)
        lm = jnp.asarray(lm35, jnp.float32)
        pose0 = initial_pose(wp)

    rows = []
    for seed in range(args.n_seeds):
        with jax.default_device(cpu):
            tape = jax.block_until_ready(
                make_tape(cfg, wp, lm, args.epochs, jax.random.key(seed)))
            pf0 = make_pf_state(pose0, args.n_particles, cfg.capacity)
            pf_c, rec_c = jax.block_until_ready(run_replay(cfg, tape, pf0))
        row = {"stage": "paired", "seed": seed,
               "cpu": _stats(tape, pf_c, rec_c, lm35, jax, np)}
        if dev is not None:
            tape_d = jax.device_put(tape, dev)
            pf0_d = jax.device_put(pf0, dev)
            pf_t, rec_t = jax.block_until_ready(
                run_replay(cfg, tape_d, pf0_d))
            row["tpu"] = _stats(tape, pf_t, rec_t, lm35, jax, np)
            row["d_ate"] = round(row["tpu"]["ate"] - row["cpu"]["ate"], 3)
        print(json.dumps(row), flush=True)
        rows.append(row)

    if dev is not None and rows:
        d = np.asarray([r["d_ate"] for r in rows])
        a_c = np.asarray([r["cpu"]["ate"] for r in rows])
        a_t = np.asarray([r["tpu"]["ate"] for r in rows])
        # Paired sign test p-value (binomial, two-sided).
        from math import comb

        k = int((d > 0).sum())
        n = int((d != 0).sum())
        p = sum(comb(n, j) for j in range(min(k, n - k) + 1)) / 2 ** n * 2
        print(json.dumps({
            "stage": "paired_summary", "n": len(rows),
            "cpu_median_ate": round(float(np.median(a_c)), 3),
            "tpu_median_ate": round(float(np.median(a_t)), 3),
            "d_ate_median": round(float(np.median(d)), 3),
            "n_tpu_worse": k, "sign_test_p": round(min(p, 1.0), 4),
        }), flush=True)

    if args.windows and dev is not None:
        M = args.windows
        seed = args.win_seed
        with jax.default_device(cpu):
            tape = jax.block_until_ready(
                make_tape(cfg, wp, lm, args.epochs, jax.random.key(seed)))
            pf = make_pf_state(pose0, args.n_particles, cfg.capacity)
        n_win = args.epochs // M
        for j in range(n_win):
            sl = jax.tree.map(lambda x: x[j * M:(j + 1) * M], tape)
            with jax.default_device(cpu):
                pf_c, rec_c = jax.block_until_ready(run_replay(cfg, sl, pf))
            pf_t, rec_t = jax.block_until_ready(run_replay(
                cfg, jax.device_put(sl, dev), jax.device_put(pf, dev)))
            act = np.asarray(sl.active[:, -1])
            if not act.any():
                break
            e_c = np.asarray(rec_c.est_pose)[act]
            e_t = np.asarray(rec_t.est_pose)[act]
            tru = np.asarray(sl.true_pose)[act]
            div = np.linalg.norm((e_c - e_t)[:, :2], axis=1)
            print(json.dumps({
                "stage": "window", "j": j, "epochs": int(act.sum()),
                "err_cpu_end": round(float(np.linalg.norm(
                    (e_c - tru)[-1, :2])), 4),
                "err_tpu_end": round(float(np.linalg.norm(
                    (e_t - tru)[-1, :2])), 4),
                "est_div_end_m": round(float(div[-1]), 4),
                "est_div_first_nonzero": int(np.argmax(div > 1e-4))
                if (div > 1e-4).any() else -1,
                "resample_flips": int((np.asarray(rec_c.resampled)[act]
                                       != np.asarray(rec_t.resampled)[act]
                                       ).sum()),
                "d_n_mean_end": round(float(
                    np.asarray(rec_t.n_mean)[act][-1]
                    - np.asarray(rec_c.n_mean)[act][-1]), 3),
                "d_neff_rms": round(float(np.sqrt(np.mean(
                    (np.asarray(rec_t.neff)[act]
                     - np.asarray(rec_c.neff)[act]) ** 2))), 2),
            }), flush=True)
            # next window continues from the CPU branch (re-sync point)
            pf = pf_c


if __name__ == "__main__":
    main()
