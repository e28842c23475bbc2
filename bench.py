#!/usr/bin/env python
"""Benchmark harness.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: full closed-loop EKF-SLAM throughput (control ticks/sec) on a
synthetic 1k-landmark scene, single chip — BASELINE.json config 2's shape.
The reference's only implicit rate is its real-time throttle: 40 Hz control
loop / 5 Hz EKF update (sim/ekfslam-sim.jl:75-76,133-137), so
vs_baseline = ticks_per_sec / 40.

Extra measurements (course1 ATE, update rate, per-phase timing) go to
stderr so stdout stays a single JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_closed_loop(cfg, landmarks, waypoints, n_epochs, key, dtype):
    """Time a full jitted closed-loop run; returns (ticks/s, result).

    Measurement methodology (important on this TPU stack): the execution
    path caches identical (executable, inputs) calls, and there is a fixed
    per-dispatch overhead of tens of ms — so every timed call uses a FRESH
    PRNG key and the rate is the MARGINAL cost between an n-epoch and a
    3n-epoch run (cancels fixed overhead and compile).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.sim.simulator import init_sim_state, run_epochs_rng

    wp = jnp.asarray(waypoints, dtype)
    lm = jnp.asarray(landmarks, dtype)
    st0 = init_sim_state(cfg, wp, dtype=dtype)

    # ONE compiled executable (chunk of n_epochs); longer runs chain it by
    # feeding the state back — avoids a second multi-minute remote compile
    # for the 3x measurement size.
    def run(mult, seed):
        t0 = time.time()
        st = st0
        recs_all = []
        for i in range(mult):
            st, recs = run_epochs_rng(
                cfg, wp, lm, st, n_epochs, jax.random.key(seed + 7919 * i)
            )
            recs_all.append(recs)
        jax.block_until_ready(st)
        np.asarray(st.ekf.x[0])  # force a real transfer barrier
        return time.time() - t0, (st, recs_all)

    t0 = time.time()
    run(1, 1000)
    t_compile = time.time() - t0

    runs_a = [run(1, s) for s in (1, 2)]
    runs_b = [run(3, s) for s in (3, 4)]
    t_a = min(t for t, _ in runs_a)
    t_b = min(t for t, _ in runs_b)
    per_epoch = (t_b - t_a) / (2 * n_epochs)
    rate = cfg.substeps_per_obs / per_epoch
    log(f"  compile+warm {t_compile:.1f}s; {n_epochs}ep {t_a:.3f}s, "
        f"{3 * n_epochs}ep {t_b:.3f}s -> {per_epoch * 1e3:.3f} ms/epoch, "
        f"{rate:.0f} ticks/s, {1.0 / per_epoch:.1f} updates/s")

    # Per-seed results (each timed run is an independent noise realization).
    results = []
    for t, (st, recs_list) in runs_a + runs_b:
        recs = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *recs_list,
        )
        results.append((st, recs))
    return rate, results


def run_stats(st, recs, true_landmarks):
    """(ate, n_landmarks, map_quality dict) for one closed-loop run."""
    from tpuslam.bench.metrics import ate_rmse, map_quality

    active = np.asarray(recs.active).reshape(-1)
    tt = np.asarray(recs.true_pose).reshape(-1, 3)[active]
    ss = np.asarray(recs.slam_pose).reshape(-1, 3)[active]
    ate = ate_rmse(ss, tt)
    n = int(st.ekf.n)
    est = np.asarray(st.ekf.x[3:3 + 2 * n]).reshape(-1, 2)
    return ate, n, map_quality(est, true_landmarks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="add landmark sweep + Monte-Carlo NEES")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuslam.config import course1_config
    from tpuslam.sim.scene import load_course, make_landmarks

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    dtype = jnp.float32

    # --- Config 1 sanity: course1, reference params — ATE gate.
    cfg1 = course1_config(n_landmarks=35, capacity=64, max_obs=48)
    wp1 = load_course()
    lm1 = make_landmarks(cfg1.scene, seed=3)
    n_ep1 = 400  # one chunk covers the full course (2802 ticks < 3600)
    log(f"[course1] 35 landmarks, cap 64, {n_ep1} epochs")
    rate1, results1 = bench_closed_loop(
        cfg1, lm1, wp1, n_ep1, jax.random.key(0), dtype
    )
    ates, n_lms, dup_rates = [], [], []
    for st, recs in results1:
        ate_i, n_i, mq = run_stats(st, recs, lm1)
        ates.append(ate_i)
        n_lms.append(n_i)
        dup_rates.append(mq["duplicate_rate"])
        log(f"  seed-run: ATE {ate_i:.3f} m; landmarks {n_i}/35 "
            f"(dup {mq['n_duplicates']}, spurious {mq['n_spurious']}, "
            f"matched-RMSE {mq['matched_rmse']:.3f} m, "
            f"coverage {mq['coverage']:.2f})")
    ate = float(np.median(ates))
    n_med = float(np.median(n_lms))
    log(f"  median over {len(ates)} noise realizations: ATE {ate:.3f} m, "
        f"landmarks {n_med:.0f}/35")

    # --- Config 2 shape: synthetic 1k-landmark scene, single chip.  Course
    # rows are spaced < 2x sensor_range and the 3x timing run covers ~the
    # whole course, so the mapped count approaches n_landmarks (the r1 bench
    # course left half the scene unseen — VERDICT weak #4).  The scene is
    # built by bench.harness.config2_setup, shared with chip_r2's dense
    # sweep so the cap-1024 headline is ONE number (VERDICT r2 weak #4).
    from tpuslam.bench.harness import config2_setup

    cfg2, wp2, lm2 = config2_setup()
    n_ep2 = 100 if args.quick else 310
    log(f"[1k-landmark] cap 1024, {n_ep2} epochs")
    rate2, results2 = bench_closed_loop(
        cfg2, lm2, wp2, n_ep2, jax.random.key(1), dtype
    )
    st2, recs2 = results2[-1]
    _, n2, mq2 = run_stats(st2, recs2, lm2)
    log(f"  landmarks mapped: {n2}/1000 (coverage {mq2['coverage']:.2f}, "
        f"dup {mq2['n_duplicates']}, matched-RMSE "
        f"{mq2['matched_rmse']:.3f} m)")

    # --- Config 3: FastSLAM, 100 particles on course1.
    from tpuslam.bench.harness import fastslam_throughput

    n_ep3 = 20 if args.quick else 60
    pf_rate, pf_ms = fastslam_throughput(cfg1, wp1, lm1, 100, n_ep3)
    log(f"[fastslam-100p] {pf_ms:.2f} ms/epoch -> {pf_rate:.0f} ticks/s")

    # PF QUALITY rows (VERDICT r4 task 5): the health gate must cover
    # FastSLAM, not just the EKF paths.  Median-of-seeds at the config
    # defaults (pf_gate_newfeat=100).  Bounds sized from the POST-FIX
    # paired-replay stats (PERF.md "chip-vs-CPU bias: RESOLVED" —
    # chip median ATE 0.62, CPU 1.44; occasional collapse realizations
    # reach ATE ~3-7 with 20-40 spurious, so the 3-seed median gates at
    # 4.0 m / 40 spurious): a regression to the r4 broken-proposal
    # class (every seed saturated, median 3.1+) trips it.
    from tpuslam.bench.harness import fastslam_accuracy

    pf_eps = 100 if args.quick else 320   # 320 covers the full course
    pf_seeds = (11, 12) if args.quick else (11, 12, 13)
    pf_ates, pf_spur = [], []
    for s in pf_seeds:
        acc = fastslam_accuracy(cfg1, wp1, lm1, 100, pf_eps, seed=s)
        pf_ates.append(acc["ate"])
        pf_spur.append(acc["n_spurious"])
        log(f"  pf seed {s}: ATE {acc['ate']:.2f} m, "
            f"landmarks {acc['n_landmarks']} "
            f"(spurious {acc['n_spurious']}, "
            f"coverage {acc['coverage']:.2f})")
    pf_ate_med = float(np.median(pf_ates))
    pf_spur_med = float(np.median(pf_spur))
    log(f"  pf median: ATE {pf_ate_med:.2f} m, spurious {pf_spur_med:.0f}")

    if args.full:
        from tpuslam.bench.harness import landmark_sweep, monte_carlo_nees

        log("[landmark sweep]")
        for row in landmark_sweep(caps=(64, 256, 1024), n_epochs=30):
            log(f"  cap {row['capacity']:5d}: "
                f"{row['ms_per_epoch']:.3f} ms/epoch, "
                f"{row['updates_per_s']:.0f} updates/s")
        nees, _ = monte_carlo_nees(cfg1, wp1, lm1, n_runs=10, n_epochs=30)
        log(f"[NEES] mean position NEES over 10 runs: {nees:.2f} "
            f"(consistent ~ 2)")

        from tpuslam.bench.harness import ba_large_throughput

        ms_ba, c0, cf, lm_err = ba_large_throughput(
            1_000_000, 64, 4, iters_per_call=2, chunk=8192
        )
        log(f"[grid-BA 1M landmarks, 64 poses] {ms_ba:.1f} ms/GN-iter "
            f"({1e3 / ms_ba:.1f} it/s); cost {c0:.2e} -> {cf:.2e}; "
            f"median landmark err {lm_err:.3f} m")

        # Sharded scaling rows (VERDICT r1 #1a): code-path proxy on an
        # 8-virtual-device CPU mesh (own subprocess — this one is bound to
        # the TPU backend) + the analytic ICI/DCN prediction it anchors.
        import subprocess
        import sys as _sys

        log("[sharded scaling, 8-virtual-device CPU mesh]")
        prc = subprocess.run(
            [_sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "scaling_cpu.py"), "1024,2048"],
            capture_output=True, text=True, timeout=3000,
        )
        for line in prc.stdout.strip().splitlines():
            log(f"  {line}")
        if prc.returncode != 0:
            log(f"  scaling subprocess FAILED: {prc.stderr[-500:]}")

        from tpuslam.bench.comm_model import ekf_update_model

        log("[comm-model prediction @ config-4 scale (cap 131072, ICI)]")
        for d in (1, 4, 8, 16):
            m = ekf_update_model(131072, 48, d)
            log(f"  D={d:2d}: {m.updates_per_s:7.2f} updates/s, "
                f"efficiency {m.efficiency:.3f}")

    # Health gate (VERDICT weak #3): median-of-seeds ATE and landmark-count
    # bounds so a broken association (duplicate blow-up) zeroes the headline.
    # Medians, not max: the reference's gated NN occasionally duplicates
    # landmarks on unlucky noise realizations (ATE ~2.4 m, reproduced
    # identically by the float64 oracle — algorithmic, not an engine bug;
    # PERF.md "Accuracy / consistency"), so a single-seed bound would gate
    # on spec-faithful behavior.
    # The coverage term scales with the epochs actually run: the full
    # 930-epoch measurement covers the whole config-2 course (0.8 gate);
    # --quick's 300 epochs only reach ~a third of it, which is a budget
    # choice, not an engine failure (measured: 354 mapped at 300 epochs
    # on the same code whose 930-epoch run maps 995).
    cov_gate = 0.8 if not args.quick else 0.25
    pf_ate_gate = 15.0 if args.quick else 4.0
    healthy = bool(
        np.all(np.isfinite(ates))
        and ate < 1.5                      # median ATE
        and n_med <= 1.2 * 35              # median landmark count
        and max(ates) < 10.0               # hard divergence catch
        and n2 >= cov_gate * 1000          # config-2 course coverage
        and np.all(np.isfinite(pf_ates))   # FastSLAM quality (task 5)
        and pf_ate_med < pf_ate_gate
        and pf_spur_med <= 40
    )
    if not healthy:
        log(f"  HEALTH GATE FAILED: median ATE {ate:.3f}, "
            f"median landmarks {n_med:.0f}, max ATE {max(ates):.3f}, "
            f"1k mapped {n2}, pf median ATE {pf_ate_med:.2f}, "
            f"pf median spurious {pf_spur_med:.0f}")
    value = rate2 if healthy else 0.0
    print(json.dumps({
        "metric": "ekfslam_1k_landmark_closed_loop_ticks_per_s_1chip",
        "value": round(float(value), 2),
        "unit": "ticks/s",
        "vs_baseline": round(float(value) / 40.0, 2),
    }))


if __name__ == "__main__":
    main()
