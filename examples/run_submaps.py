#!/usr/bin/env python
"""Hierarchical submap EKF-SLAM demo (unbounded-landmark architecture).

Runs the bounded-capacity submap engine (graph/submaps.py) on a dense
landmark field, then closes the loop globally with the anchor-graph BA
and renders the merged global map next to the ground truth.

    python examples/run_submaps.py [--landmarks 600] [--cap 128]
                                   [--extent 220] [--epochs 1500]
                                   [--frame out.png] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=600)
    ap.add_argument("--cap", type=int, default=128,
                    help="LOCAL submap capacity (total landmarks may far "
                         "exceed it)")
    ap.add_argument("--extent", type=float, default=220.0)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--frame", type=str, default="submaps.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpuslam.bench.metrics import ate_rmse, map_quality
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.graph.submaps import (
        SubmapSLAM,
        merge_duplicates_covisibility,
        select_backend,
    )
    from tpuslam.sim.scene import make_landmarks, make_survey_course

    scene = SceneConfig(
        xmin=0.0, xmax=args.extent, ymin=0.0, ymax=args.extent,
        n_landmarks=args.landmarks, legacy_integer_landmarks=False,
    )
    cfg = SimConfig(scene=scene, capacity=args.cap, max_obs=32)
    wp = make_survey_course(args.extent, row_spacing=35.0, inset=0.05)
    lm = make_landmarks(scene, seed=4)
    spacing = args.extent / np.sqrt(args.landmarks)
    radius = float(min(3.0, 0.4 * spacing))

    # The r4 recipe: online 'align' mode (scan-to-map conformance +
    # loop-closure probe), evaluated backend selection, assembly from
    # the ONLINE associations, co-visibility duplicate merge.
    slam = SubmapSLAM(cfg, close_frac=0.7, chunk_epochs=64,
                      match_radius=radius, online_mode="align",
                      register_radius=15.0)
    run = slam.run(wp, lm, args.epochs, jax.random.key(0))
    a = run.active
    ate = ate_rmse(run.slam_pose[a], run.true_pose[a])
    print(f"{len(run.submaps)} submaps (cap {args.cap}); online ATE "
          f"{ate:.2f} m over {int(a.sum())} ticks")

    init = np.asarray([sm.anchor0 for sm in run.submaps])
    name, anchors, _ = select_backend(run.submaps, init, radius,
                                      register_radius=None)
    print(f"global solve: {name}")
    gm, _ = merge_duplicates_covisibility(
        run.submaps, anchors, run.online_gids, len(run.online_table),
        radius)
    # Gauge-aligned scoring (standard for at-scale maps): an unobservable
    # fraction-of-a-degree global rotation otherwise dominates the
    # numbers (see PERF.md).
    mq = map_quality(gm, lm, align_gauge=True)
    print(f"global map: {len(gm)} landmarks "
          f"(true {args.landmarks}, matched {mq['n_matched_true']}, "
          f"dup {mq['n_duplicates']}, spurious {mq['n_spurious']}); "
          f"matched RMSE {mq['matched_rmse']:.2f} m, "
          f"coverage {mq['coverage']:.2f}")

    if args.frame:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8), dpi=110)
        ax.plot(lm[:, 0], lm[:, 1], "*", ms=4, color="0.75",
                label="true landmarks")
        ax.plot(gm[:, 0], gm[:, 1], "+", ms=5, color="tab:red",
                label="global map (post-BA)")
        tp = run.true_pose[a]
        sp = run.slam_pose[a]
        ax.plot(tp[:, 0], tp[:, 1], "-", lw=0.8, color="k",
                label="true track")
        ax.plot(sp[:, 0], sp[:, 1], "-", lw=0.8, color="tab:green",
                label="online SLAM track")
        ax.plot(anchors[:, 0], anchors[:, 1], "s", ms=6, mfc="none",
                color="tab:blue", label="submap anchors")
        ax.set_aspect("equal")
        ax.legend(loc="upper right", fontsize=8)
        ax.set_title(f"{len(run.submaps)} cap-{args.cap} submaps, "
                     f"{args.landmarks} landmarks")
        fig.savefig(args.frame, bbox_inches="tight")
        print(f"wrote {args.frame}")


if __name__ == "__main__":
    main()
