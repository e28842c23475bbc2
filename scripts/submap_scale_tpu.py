#!/usr/bin/env python
"""Submap EKF-SLAM at scale on the real chip — the config-5 pipeline.

ONE command that runs both halves end-to-end:

  1. front end — capacity-bounded submap EKF (graph/submaps.py) over a
     scene with total landmarks >> any dense-EKF capacity, with the
     constant-cost online alignment corrector;
  2. backend — the landmark-major grid BA (graph/ba_large.py, the
     machinery measured at 1M landmarks) solving the anchor graph
     ON DEVICE via build_grid_from_submaps.

Reports:
  * per-chunk wall ms/epoch over the run — must stay FLAT as the total
    mapped count grows (per-update cost is O((2C)^2), independent of
    global map size);
  * online ATE (+ median error by run third — drift visibility);
  * post-BA global map quality (coverage / duplicates / spurious /
    matched RMSE) and backend wall time.

Usage:
  python scripts/submap_scale_tpu.py [n_landmarks] [extent] [cap]
         [--mode align|ba|none] [--solver grid|host] [--rounds N]
         [--diag PATH.npz]
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
    ap.add_argument("n_landmarks", nargs="?", type=int, default=20000)
    ap.add_argument("extent", nargs="?", type=float, default=800.0)
    ap.add_argument("cap", nargs="?", type=int, default=512)
    ap.add_argument("--mode", default="align",
                    choices=("align", "ba", "none"))
    ap.add_argument("--solver", default="auto",
                    choices=("auto", "gpa+grid", "grid", "host", "gpa",
                             "none"),
                    help="global backend: auto (measured best: plain "
                         "match+assemble when the online aligner ran — "
                         "it already sits at the oracle floor and every "
                         "optimizer drags it (2k: rmse 0.255 -> 0.48 "
                         "gpa / 0.49 grid); gpa+grid when dead-reckoned), "
                         "gpa+grid (Procrustes sweeps + one on-device "
                         "grid-GN polish), grid (ba_large rounds), host "
                         "(factor-list BA), gpa (sweeps only), none "
                         "(match+assemble only)")
    ap.add_argument("--merge", default="covis",
                    choices=("covis", "fixed", "none"),
                    help="post-assembly duplicate handling: covis "
                         "(default — co-visibility-vetoed evidence merge, "
                         "600-lm measured dup 49->12 at coverage "
                         "1.0->0.997 and BETTER rmse), fixed (old 0.5x-"
                         "gate union-find: dup 112->5 but coverage "
                         "0.859->0.802 at 2k — a trade), none")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=128,
                    help="front-end epochs per compiled chunk")
    ap.add_argument("--ba-chunk", type=int, default=8192,
                    help="grid-BA landmark chunk")
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--diag", default="/tmp/submap_scale_diag.npz")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to host CPU (small-scale validation runs)")
    ap.add_argument("--save-run", default=None,
                    help="pickle the front-end SubmapRun here (iterate on "
                         "backends without re-running the chip front end)")
    ap.add_argument("--load-run", default=None,
                    help="skip the front end; load a pickled run")
    ap.add_argument("--no-handover", action="store_true")
    ap.add_argument("--course", default="survey",
                    choices=("survey", "perimeter", "lawnmower"),
                    help="survey (block-partitioned, bounded unclosed "
                         "loops — the at-scale default), perimeter (one "
                         "global perimeter lap + rows), lawnmower (bare "
                         "rows)")
    ap.add_argument("--register-radius", type=float, default=None,
                    help="translation-vote search radius; default scales "
                         "with the drift budget of the longest closed "
                         "loop (~2%% of the perimeter length)")
    ap.add_argument("--close-frac", type=float, default=0.75)
    # max_obs 32 measured 4x better map RMSE than 48 at 2k density
    # (0.255 vs 0.97): the far third of a 48-obs panel is 25-30 m
    # sightings whose bearing-noise footprint mints in-filter duplicates.
    ap.add_argument("--max-obs", type=int, default=32)
    ap.add_argument("--sensor-range", type=float, default=25.0,
                    help="detection radius [m]; 25 keeps the visible "
                         "count under the obs panel AND drops the far "
                         "sightings whose bearing-noise footprint mints "
                         "in-filter duplicates (reference default 30)")
    ap.add_argument("--row-spacing", type=float, default=35.0)
    ap.add_argument("--handover-inflate", type=float, default=4.0)
    ap.add_argument("--vote-topk", type=int, default=6,
                    help="score the k tallest loop-probe vote peaks at a "
                         "tight gate (de-masks alias-buried offsets).  "
                         "Default 6: measured better on BOTH course "
                         "families at 20k (survey map coverage "
                         "0.66->0.81, RMSE 1.19->0.78; lawnmower ATE "
                         "18.7->1.3 aligned); 1 = argmax-only")
    ap.add_argument("--budget-window", action="store_true",
                    help="clamp the loop-probe vote window to the drift "
                         "budget since the last fix")
    ap.add_argument("--constel-bin", type=float, default=0.25,
                    help="constellation triangle-hash bin [m]; 0.125 "
                         "at 1M scale (8x lower bucket density)")
    ap.add_argument("--no-pgo", action="store_true",
                    help="skip the assembly-stage constellation-PGO "
                         "unbend (r5 default on)")
    ap.add_argument("--max-epochs", type=int, default=120000,
                    help="epoch-budget ceiling; a survey course at extent "
                         "E needs ~E^2/(row_spacing*0.6) epochs — raise "
                         "this for extents past ~1.2 km or the course is "
                         "truncated mid-field")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpuslam.bench.metrics import ate_rmse, map_quality
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.graph.submaps import (
        SubmapSLAM,
        assemble_global_map,
        gpa_refine_anchors,
        match_submap_landmarks,
        optimize_anchor_graph,
        optimize_anchor_graph_grid,
    )
    from tpuslam.sim.scene import make_grid_course, make_landmarks

    n_lm, extent, cap = args.n_landmarks, args.extent, args.cap

    scene = SceneConfig(xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
                        n_landmarks=n_lm, legacy_integer_landmarks=False)
    from tpuslam.config import VehicleConfig
    import dataclasses as _dc

    veh = _dc.replace(VehicleConfig(), sensor_range=args.sensor_range)
    cfg = SimConfig(scene=scene, capacity=cap, max_obs=args.max_obs,
                    vehicle=veh)
    # Row spacing ~40 m (vs 30 m sensor range): a ~20 m strip of landmarks
    # is shared between adjacent rows, so cross-row matches correct the
    # anchor chain continuously.  55 m spacing (7 m strip) was measured
    # insufficient: drift outran the match gate and the chain went
    # open-loop (online ATE 71 m at 20k landmarks).
    n_side = max(4, int(extent / 40.0) + 1)
    if args.course == "survey":
        from tpuslam.sim.scene import make_survey_course

        wp = make_survey_course(extent, row_spacing=args.row_spacing,
                                inset=0.05)
    else:
        wp = make_grid_course(extent, n_per_side=n_side, inset=0.05,
                              perimeter_first=args.course == "perimeter")
    lm = make_landmarks(scene, seed=args.seed)
    dev = jax.devices()[0]
    print(json.dumps({"stage": "env", "platform": dev.platform,
                      "kind": dev.device_kind, "n_landmarks": n_lm,
                      "extent": extent, "cap": cap, "mode": args.mode,
                      "solver": args.solver, "course_rows": n_side}),
          flush=True)

    # Density-aware match gate: must stay well under the landmark spacing
    # or cross-submap matching merges NEIGHBORS (wrong loop closures).
    spacing = extent / max(np.sqrt(n_lm), 1.0)
    radius = float(min(3.0, 0.4 * spacing))
    # Drift budget for the biggest loop the online aligner must close:
    # ~2% of the loop lap (measured heading-drift rate ~0.9%/m of
    # travel builds ~13-16 m around a 936 m perimeter at 260 m extent).
    # On the survey course the loop scale is the BLOCK (<= 280 m by
    # design), NOT the field extent: the 20k run at extent 800 with an
    # extent-scaled 57.6 m radius showed why — at 0.03 lm/m^2 a 1 m NN
    # gate passes ~10% random matches, so a 57 m vote window mints
    # 30-80-inlier alias peaks (~55 m, all correctly rejected by the
    # drift gate) that MASK the true peak (argmax), real ~5 m inter-row
    # drift never gets corrected, and error random-walks (ATE 18.7 m).
    loop_extent = min(extent, 280.0) if args.course == "survey" else extent
    reg_r = (args.register_radius if args.register_radius is not None
             else float(np.clip(0.02 * 4 * 0.9 * loop_extent, 15.0, 80.0)))
    slam = SubmapSLAM(cfg, close_frac=args.close_frac,
                      chunk_epochs=args.chunk,
                      match_radius=radius, online_mode=args.mode,
                      handover=not args.no_handover,
                      handover_inflate=args.handover_inflate,
                      register_radius=reg_r,
                      vote_topk=args.vote_topk,
                      budget_vote_window=args.budget_window,
                      constel_bin=args.constel_bin)

    # Per-chunk timing now comes from slam.chunk_wall (recorded inside
    # run() around the single dispatch+fetch per chunk) — the old
    # blocking monkeypatch timer added one extra sync per chunk, itself
    # part of the r3 host-overhead wall.
    import pickle

    if args.load_run:
        with open(args.load_run, "rb") as f:
            saved = pickle.load(f)
        run, t_hist, t_front = saved["run"], saved["t_hist"], saved["t_s"]
        slam.trace = saved["trace"]
    else:
        slam.verbose = True
        t_front0 = time.time()
        # Budget: course length / (9 ticks * dt * v) epochs, + margin.
        path_m = float(np.linalg.norm(np.diff(wp, axis=0),
                                      axis=1).sum())
        n_epochs = int(path_m / 0.6) + 2000
        n_epochs = min(n_epochs, args.max_epochs)
        run = slam.run(wp, lm, n_epochs, jax.random.key(0))
        t_front = time.time() - t_front0
        t_hist = [w / n * 1e3 for n, w in slam.chunk_wall]
        if args.save_run:
            with open(args.save_run, "wb") as f:
                pickle.dump({"run": run, "t_hist": t_hist,
                             "t_s": t_front, "trace": slam.trace}, f)

    a = run.active
    ate = float(ate_rmse(run.slam_pose[a], run.true_pose[a]))
    ate_al = float(ate_rmse(run.slam_pose[a], run.true_pose[a],
                            align_gauge=True))
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
        "online_ate_aligned_m": round(ate_al, 3),
        "median_err_by_third_m": [round(t, 2) for t in thirds],
        "t_frontend_s": round(t_front, 1),
        "ms_per_epoch_first_decile": round(
            float(np.mean(th[: max(1, len(th) // 10)])), 3),
        "ms_per_epoch_last_decile": round(
            float(np.mean(th[-max(1, len(th) // 10):])), 3),
        "phase_wall_s": {k: round(v, 1) for k, v in
                         getattr(slam, "phase_wall", {}).items()},
    }), flush=True)
    tr = [t for t in slam.trace if "corr_m" in t]
    refines = [t for t in slam.trace if t.get("refine")]
    if tr:
        co = np.asarray([t["corr_m"] for t in tr])
        nacc = sum(t["accepted"] for t in tr)
        print(json.dumps({
            "stage": "trace", "n_corrections": len(tr),
            "n_accepted": int(nacc),
            "n_refine_rejected": len(refines),
            "corr_m_p50": round(float(np.median(co)), 2),
            "corr_m_max": round(float(co.max()), 2),
            "rejected_sizes_m": [round(t["corr_m"], 1) for t in tr
                                 if not t["accepted"]][:20],
        }), flush=True)

    t0 = time.time()
    init = np.asarray([sm.anchor0 for sm in run.submaps])
    log = (lambda m: print(f"# {m}", file=sys.stderr, flush=True))
    anchors = init
    # Assembly-stage unbend (r5): constellation loop edges + SE(2) PGO
    # over the anchor chain.  The online corrector can only conform the
    # chain HEAD; early drift baked into the table before the first
    # revisit leaves the chain smoothly bent, which no assembly-side
    # matching can recover (measured 20k worst seed: coverage 0.38
    # online / 0.39 re-match / 0.98 after PGO).  No-op on clean chains
    # (edges then agree with the anchors already).
    pgo_moved = 0.0
    if not args.no_pgo and len(run.submaps) >= 4:
        from tpuslam.graph.pgo import pgo_unbend

        t_pgo = time.time()
        # The EDGE-extraction db always uses the sparse 0.125 bin: at
        # 100k the 0.25-bin extraction ran 15x slower (35+ min vs
        # 131 s) at identical edge quality (coverage 0.973 either way).
        anchors, n_edges = pgo_unbend(run.submaps, init, radius,
                                      constel_bin=min(
                                          args.constel_bin, 0.125),
                                      log=log)
        pgo_moved = float(np.linalg.norm(
            (anchors - init)[:, :2], axis=1).max())
        print(json.dumps({
            "stage": "pgo", "n_edges": int(n_edges),
            "max_anchor_move_m": round(pgo_moved, 2),
            "t_pgo_s": round(time.time() - t_pgo, 1),
        }), flush=True)
    # Translation voting in the BACKEND matching is only for chains whose
    # drift exceeds the match gate (dead-reckoned modes).  On an
    # online-aligned chain it is pure downside — measured on the 2k chip
    # run: plain assembly 0.614 m matched RMSE with the 26 m vote window
    # (alias peaks drag whole submaps) vs 0.237 m with voting off.
    reg_backend = None if args.mode == "align" else reg_r
    solver_used = args.solver
    if args.solver == "auto":
        from tpuslam.graph.submaps import select_backend

        # Candidates start from the PGO-repaired anchors (measured on
        # the 20k worst seed: pgo 0.571 m RMSE -> pgo+gpa 0.462 at
        # coverage 0.977 -> 0.981 — the consensus polish composes).
        solver_used, anchors, report = select_backend(
            run.submaps, anchors, radius, register_radius=reg_backend,
            chunk=args.ba_chunk, log=log)
        print(json.dumps({"stage": "solver_select",
                          "picked": solver_used,
                          **{f"{k}_med_res": round(v["med_res"], 4)
                             for k, v in report.items()}}), flush=True)
    elif args.solver in ("gpa+grid", "gpa"):
        anchors, gids, table = gpa_refine_anchors(
            run.submaps, anchors, match_radius=radius,
            register_radius=reg_backend,
            rematch_rounds=2 if args.solver == "gpa+grid" else 3,
        )
        log(f"gpa done ({time.time() - t0:.1f}s)")
    if args.solver in ("gpa+grid", "grid"):
        prob, gids, anchors = optimize_anchor_graph_grid(
            run.submaps,
            rounds=1 if args.solver == "gpa+grid" else args.rounds,
            iters=12, match_radius=radius, init_anchors=anchors,
            register_radius=reg_backend, chunk=args.ba_chunk, log=log,
        )
    elif args.solver == "host":
        prob, gids, anchors = optimize_anchor_graph(
            run.submaps, rounds=args.rounds, iters=15, match_radius=radius,
            init_anchors=anchors, register_radius=reg_backend,
        )
    # Assembly associations: prefer the ONLINE gids (each submap was
    # matched against the emerging map when relative drift was near
    # zero) — the offline re-match has a quality cliff once accumulated
    # drift crosses the match gate (measured 20k: online aligned-ATE
    # 2.1 m yet re-matched coverage 0.39).  Associations are
    # anchor-independent, so they remain valid under solver-refined
    # anchors.  Fall back to re-matching for non-align runs.
    if getattr(run, "online_gids", None) is not None \
            and pgo_moved <= radius:
        # Clean chain: the ONLINE associations (made when relative drift
        # was near zero) remain the best source (r4 lesson).
        gids, table = run.online_gids, run.online_table
        anchors = np.asarray(anchors)
        log("assembly: online associations")
    else:
        # The PGO moved anchors past the gate — the online table carries
        # that drift's ghosts; a fresh NN re-match at the REPAIRED
        # anchors is measured better on exactly these runs (20k worst
        # seed: online gids 0.93 coverage / re-match 0.98).
        gids, table, anchors = match_submap_landmarks(
            run.submaps, anchors, radius, register_radius=reg_backend)
        log("assembly: offline re-match at repaired anchors")
    t_ba = time.time() - t0
    gm = assemble_global_map(run.submaps, anchors, gids, len(table))
    if args.merge == "covis":
        from tpuslam.graph.submaps import merge_duplicates_covisibility

        gm, _ = merge_duplicates_covisibility(
            run.submaps, anchors, gids, len(table), radius)
    elif args.merge == "fixed":
        from tpuslam.graph.submaps import merge_duplicates

        gm, _ = merge_duplicates(gm, radius=0.5 * radius)
    mq = map_quality(gm, lm)                     # absolute frame
    mqa = map_quality(gm, lm, align_gauge=True)  # gauge-aligned (standard)
    print(json.dumps({
        "stage": "ba", "solver": solver_used, "merge": args.merge,
        "global_landmarks": int(len(gm)),
        "t_backend_s": round(t_ba, 1),
        "t_total_s": round(t_front + t_ba, 1),
        "n_anchors": int(len(anchors)),
        "matched_rmse_m": round(float(mqa["matched_rmse"]), 3),
        "coverage": round(float(mqa["coverage"]), 3),
        "n_duplicates": int(mqa["n_duplicates"]),
        "n_spurious": int(mqa["n_spurious"]),
        "n_matched_true": int(mqa["n_matched_true"]),
        "abs_coverage": round(float(mq["coverage"]), 3),
        "abs_matched_rmse_m": round(float(mq["matched_rmse"]), 3),
    }), flush=True)

    np.savez(args.diag,
             slam_pose=run.slam_pose[a][::9].astype(np.float32),
             true_pose=run.true_pose[a][::9].astype(np.float32),
             anchors=run.anchors,
             anchors_opt=np.asarray(anchors),
             submap_sizes=np.asarray(sizes),
             corr_m=np.asarray([t["corr_m"] for t in tr]),
             corr_rad=np.asarray([t["corr_rad"] for t in tr]),
             accepted=np.asarray([t["accepted"] for t in tr]))


if __name__ == "__main__":
    main()
