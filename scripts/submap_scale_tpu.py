#!/usr/bin/env python
"""Submap EKF-SLAM at scale on the real chip (config-5 evidence).

Maps a scene with total landmarks >> any single dense-EKF capacity using
capacity-1024 submaps (graph/submaps.py), then closes the loop globally
with the anchor-graph BA.  Reports:

  * per-chunk wall ms/epoch over the run — must stay FLAT as the total
    mapped count grows (the submap architecture's whole point: per-update
    cost is O((2C)^2), independent of global map size);
  * total landmarks mapped vs scene truth within the sensed corridor;
  * post-BA global map quality (duplicates / spurious / matched RMSE).

Usage: python scripts/submap_scale_tpu.py [n_landmarks] [extent] [cap]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpuslam.bench.metrics import ate_rmse, map_quality
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.graph.submaps import (
        SubmapSLAM,
        assemble_global_map,
        optimize_anchor_graph,
    )
    from tpuslam.sim.scene import make_grid_course, make_landmarks

    n_lm = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    extent = float(sys.argv[2]) if len(sys.argv) > 2 else 800.0
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    scene = SceneConfig(xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
                        n_landmarks=n_lm, legacy_integer_landmarks=False)
    cfg = SimConfig(scene=scene, capacity=cap, max_obs=48)
    # Row spacing ~40 m (vs 30 m sensor range): a ~20 m strip of landmarks
    # is shared between adjacent rows, so cross-row matches correct the
    # anchor chain continuously.  55 m spacing (7 m strip) was measured
    # insufficient: drift outran the match gate and the chain went
    # open-loop (online ATE 71 m at 20k landmarks).
    n_side = max(4, int(extent / 40.0) + 1)
    wp = make_grid_course(extent, n_per_side=n_side, inset=0.05)
    lm = make_landmarks(scene, seed=4)
    dev = jax.devices()[0]
    print(json.dumps({"stage": "env", "platform": dev.platform,
                      "kind": dev.device_kind, "n_landmarks": n_lm,
                      "extent": extent, "cap": cap,
                      "course_rows": n_side}), flush=True)

    # Density-aware match gate: must stay well under the landmark spacing
    # or cross-submap matching merges NEIGHBORS (wrong loop closures).
    spacing = extent / max(np.sqrt(n_lm), 1.0)
    radius = float(min(3.0, 0.4 * spacing))
    chunk = 128
    slam = SubmapSLAM(cfg, close_frac=0.75, chunk_epochs=chunk,
                      match_radius=radius)

    # Instrumented run: wrap the runner loop to time chunks.
    t_hist = []
    orig_run = slam.run

    import tpuslam.sim.simulator as simmod
    real_run_epochs = simmod.run_epochs_rng

    def timed(cfgx, wpx, lmx, st, n, k):
        t0 = time.time()
        out = jax.block_until_ready(real_run_epochs(cfgx, wpx, lmx, st, n, k))
        t_hist.append((time.time() - t0) / n * 1e3)
        if len(t_hist) % 20 == 0:
            rss = int(open("/proc/self/statm").read().split()[1]) * 4096
            print(f"# chunk {len(t_hist)} rss {rss/2**30:.1f} GiB "
                  f"n={int(st.ekf.n)}", file=sys.stderr, flush=True)
        return out

    simmod.run_epochs_rng = timed
    try:
        # Budget: course length / (9 ticks * dt * v) epochs, + margin.
        n_epochs = int(n_side * extent / 0.6) // 1 + 2000
        n_epochs = min(n_epochs, 40000)
        run = orig_run(wp, lm, n_epochs, jax.random.key(0))
    finally:
        simmod.run_epochs_rng = real_run_epochs

    a = run.active
    ate = float(ate_rmse(run.slam_pose[a], run.true_pose[a]))
    sizes = [len(s.lm_local) for s in run.submaps]
    # Drop the first chunk (compile) from the flatness check.
    th = np.asarray(t_hist[1:])
    err = np.linalg.norm(
        (run.slam_pose[a] - run.true_pose[a])[:, :2], axis=1)
    thirds = [float(np.median(x)) for x in np.array_split(err, 3)]
    print(json.dumps({
        "stage": "run", "n_epochs_used": int(a.sum() // 9),
        "n_submaps": len(run.submaps),
        "total_local_landmarks": int(sum(sizes)),
        "online_ate_m": round(ate, 3),
        "median_err_by_third_m": [round(t, 2) for t in thirds],
        "ms_per_epoch_first_decile": round(
            float(np.mean(th[: max(1, len(th) // 10)])), 3),
        "ms_per_epoch_last_decile": round(
            float(np.mean(th[-max(1, len(th) // 10):])), 3),
    }), flush=True)
    tr = slam.trace
    if tr:
        co = np.asarray([t["corr_m"] for t in tr])
        nacc = sum(t["accepted"] for t in tr)
        print(json.dumps({
            "stage": "trace", "n_corrections": len(tr),
            "n_accepted": int(nacc),
            "corr_m_p50": round(float(np.median(co)), 2),
            "corr_m_max": round(float(co.max()), 2),
            "rejected_sizes_m": [round(t["corr_m"], 1) for t in tr
                                 if not t["accepted"]][:20],
        }), flush=True)
    np.savez("/tmp/submap_scale_diag.npz",
             slam_pose=run.slam_pose[a][::9].astype(np.float32),
             true_pose=run.true_pose[a][::9].astype(np.float32),
             anchors=run.anchors,
             submap_sizes=np.asarray(sizes),
             corr_m=np.asarray([t["corr_m"] for t in tr]),
             corr_rad=np.asarray([t["corr_rad"] for t in tr]),
             accepted=np.asarray([t["accepted"] for t in tr]))

    t0 = time.time()
    prob, gids, anchors = optimize_anchor_graph(
        run.submaps, rounds=3, iters=15, match_radius=radius,
        init_anchors=[sm.anchor0 for sm in run.submaps],
        register_radius=15.0,
    )
    t_ba = time.time() - t0
    gm = assemble_global_map(run.submaps, anchors, gids,
                             int(prob.lm_mask.sum()))
    mq = map_quality(gm, lm)
    print(json.dumps({
        "stage": "ba",
        "global_landmarks": int(len(gm)),
        "t_anchor_ba_s": round(t_ba, 1),
        "n_anchors": int(prob.poses.shape[0]),
        "matched_rmse_m": round(float(mq["matched_rmse"]), 3),
        "coverage": round(float(mq["coverage"]), 3),
        "n_duplicates": int(mq["n_duplicates"]),
        "n_spurious": int(mq["n_spurious"]),
        "n_matched_true": int(mq["n_matched_true"]),
    }), flush=True)


if __name__ == "__main__":
    main()
