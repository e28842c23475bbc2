#!/usr/bin/env python
"""Config-5 assembly at 1M landmarks: constellation loop edges + SE(2)
PGO + re-match + covis merge on SYNTHESIZED submap clouds with realistic
odometry drift.

Why synthesized: the 1M joined front end is a ~2 h single-chip run
(epoch count scales with area; the per-epoch cost independence is
demonstrated at 100k, PERF.md) — what r5 ADDED and must demonstrate at
1M scale is the ASSEMBLY: can the place-recognition pose graph + the
host association/merge machinery unbend and join ~4 000 submaps /
~1.5 M local landmarks into a 1M-landmark map?  This script builds
that exact input: a survey-course anchor chain over a 1M-landmark
field, per-submap clouds sampled from the true field with sensor-grade
noise, REL-POSE ODOMETRY corrupted with the measured drift rate
(~0.9 %/m + heading noise), and the dead-reckoned (bent) chain as the
initial anchors — then runs the production assembly path end-to-end
and scores against truth.

Usage: python scripts/assembly_1m.py [n_landmarks] [extent]
       [--submap-span M] [--constel-bin B]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_landmarks", nargs="?", type=int, default=1_000_000)
    ap.add_argument("extent", nargs="?", type=float, default=5700.0)
    ap.add_argument("--submap-span", type=float, default=120.0,
                    help="travel per submap [m] (sets the chain length)")
    ap.add_argument("--sensor-range", type=float, default=27.0)
    ap.add_argument("--row-spacing", type=float, default=35.0)
    ap.add_argument("--constel-bin", type=float, default=0.125)
    ap.add_argument("--probe-stride", type=int, default=1,
                    help="probe every k-th submap for loop edges (the "
                         "edge-extraction wall is linear in probes; the "
                         "unbend needs edges ALONG the chain, not one "
                         "per submap)")
    ap.add_argument("--drift-xy", type=float, default=0.20,
                    help="per-hop translation noise sigma [m]")
    ap.add_argument("--drift-th", type=float, default=0.004,
                    help="per-hop heading noise sigma [rad] "
                         "(+ a 0.001 systematic bend component)")
    ap.add_argument("--seed", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpuslam.bench.metrics import map_quality
    from tpuslam.config import SceneConfig
    from tpuslam.graph.pgo import pgo_unbend
    from tpuslam.graph.submaps import (ClosedSubmap, _wrap,
                                       match_submap_landmarks,
                                       merge_duplicates_covisibility,
                                       se2_compose)
    from tpuslam.sim.scene import make_landmarks, make_survey_course
    from tpuslam.native import SpatialIndex

    rng = np.random.default_rng(args.seed)
    scene = SceneConfig(xmin=0.0, xmax=args.extent, ymin=0.0,
                        ymax=args.extent, n_landmarks=args.n_landmarks,
                        legacy_integer_landmarks=False)
    t0 = time.time()
    lm = make_landmarks(scene, seed=args.seed)
    wp = make_survey_course(args.extent, row_spacing=args.row_spacing,
                            inset=0.05)
    # True anchor chain: points every submap-span of travel along the
    # course polyline, heading along the segment.
    seg = np.diff(wp, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    s_cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = s_cum[-1]
    S = int(total // args.submap_span)
    s_at = np.arange(S) * args.submap_span
    seg_i = np.clip(np.searchsorted(s_cum, s_at, side="right") - 1,
                    0, len(seg) - 1)
    frac = (s_at - s_cum[seg_i]) / np.maximum(seg_len[seg_i], 1e-9)
    pos = wp[seg_i] + frac[:, None] * seg[seg_i]
    head = np.arctan2(seg[seg_i, 1], seg[seg_i, 0])
    truth_anc = np.concatenate([pos, head[:, None]], axis=1)
    idx = SpatialIndex(lm, cell_size=args.sensor_range)
    print(json.dumps({"stage": "scene", "n_landmarks": args.n_landmarks,
                      "extent": args.extent, "n_submaps": S,
                      "course_m": round(float(total)),
                      "t_s": round(time.time() - t0, 1)}), flush=True)

    # Submap clouds: the landmarks a sensor sweeping the span would map
    # (all within sensor range of the segment), with 0.1 m local noise,
    # expressed in the anchor's local frame.
    t0 = time.time()
    subs = []
    n_local = 0
    for i in range(S):
        a = truth_anc[i]
        mid = a[:2] + 0.5 * args.submap_span * np.array(
            [np.cos(a[2]), np.sin(a[2])])
        sel = idx.visible(np.array([mid[0], mid[1], a[2]]),
                          args.sensor_range + 0.55 * args.submap_span)
        # visible() is a half-plane test; take a disk around mid instead
        d = np.linalg.norm(lm[sel] - mid, axis=1)
        sel = sel[d < args.sensor_range + 0.5 * args.submap_span]
        pts = lm[sel] + rng.normal(0.0, 0.1, (len(sel), 2))
        c, s = np.cos(a[2]), np.sin(a[2])
        loc = (pts - a[:2]) @ np.array([[c, s], [-s, c]]).T
        # rel-pose odometry to the next anchor, CORRUPTED with drift.
        if i < S - 1:
            b = truth_anc[i + 1]
            dv = b[:2] - a[:2]
            rel = np.array([c * dv[0] + s * dv[1],
                            -s * dv[0] + c * dv[1],
                            _wrap(b[2] - a[2])])
            rel[:2] += rng.normal(0.0, args.drift_xy, 2)
            rel[2] += rng.normal(0.0, args.drift_th) + 0.001
        else:
            rel = np.zeros(3)
        subs.append(ClosedSubmap(
            anchor0=a.copy(), lm_local=loc,
            lm_cov=np.tile(0.01 * np.eye(2), (len(loc), 1, 1)),
            rel_pose=rel, rel_cov=np.eye(3) * 1e-4))
        n_local += len(loc)
    # Dead-reckoned (bent) chain = the assembly's initial anchors.
    bent = [truth_anc[0].copy()]
    for i in range(S - 1):
        bent.append(se2_compose(bent[-1], subs[i].rel_pose))
    bent = np.asarray(bent)
    for i, sm in enumerate(subs):
        subs[i] = sm._replace(anchor0=bent[i])
    bend = np.linalg.norm((bent - truth_anc)[:, :2], axis=1)
    print(json.dumps({"stage": "chain", "total_local_landmarks": n_local,
                      "dead_reckoned_err_p50_m": round(
                          float(np.median(bend)), 1),
                      "dead_reckoned_err_max_m": round(
                          float(bend.max()), 1),
                      "t_s": round(time.time() - t0, 1)}), flush=True)

    # --- the production assembly path.
    spacing = args.extent / np.sqrt(args.n_landmarks)
    radius = float(min(3.0, 0.4 * spacing))
    log = lambda m: print(f"# {m}", file=sys.stderr, flush=True)
    t0 = time.time()
    anc, n_edges = pgo_unbend(subs, bent, radius,
                              constel_bin=args.constel_bin,
                              probe_stride=args.probe_stride, log=log)
    t_pgo = time.time() - t0
    moved = np.linalg.norm((anc - bent)[:, :2], axis=1)
    res_vs_truth = np.linalg.norm((anc - truth_anc)[:, :2], axis=1)
    print(json.dumps({
        "stage": "pgo", "n_edges": int(n_edges),
        "t_pgo_s": round(t_pgo, 1),
        "max_anchor_move_m": round(float(moved.max()), 1),
        "anchor_err_vs_truth_p50_m": round(
            float(np.median(res_vs_truth)), 2),
        "anchor_err_vs_truth_p90_m": round(
            float(np.percentile(res_vs_truth, 90)), 2),
    }), flush=True)

    t0 = time.time()
    gids, table, anc2 = match_submap_landmarks(subs, anc, radius)
    t_match = time.time() - t0
    t0 = time.time()
    gm, _ = merge_duplicates_covisibility(subs, anc2, gids, len(table),
                                          radius)
    t_merge = time.time() - t0
    t0 = time.time()
    mq = map_quality(gm, lm, align_gauge=True)
    print(json.dumps({
        "stage": "assembly", "global_landmarks": int(len(gm)),
        "t_match_s": round(t_match, 1), "t_merge_s": round(t_merge, 1),
        "t_score_s": round(time.time() - t0, 1),
        "coverage": round(float(mq["coverage"]), 3),
        "matched_rmse_m": round(float(mq["matched_rmse"]), 3),
        "n_spurious": int(mq["n_spurious"]),
        "n_duplicates": int(mq["n_duplicates"]),
    }), flush=True)


if __name__ == "__main__":
    main()
