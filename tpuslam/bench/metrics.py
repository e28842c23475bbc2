"""Accuracy / consistency metrics.

The reference records true and SLAM tracks side by side every tick
(sim/ekfslam-sim.jl:126-128, src/common.jl:9-10) but computes no metric from
them — these are the metrics BASELINE.json requires on that hook.
"""

from __future__ import annotations

import numpy as np


def ate_rmse(slam_track, true_track, align_gauge: bool = False) -> float:
    """Absolute trajectory error (RMSE over xy positions).

    Both tracks (T, 3) poses aligned in time.  Default is the raw frame
    — the reference filter is anchored at the true initial pose
    (sim/ekfslam-sim.jl:42), so frames coincide by construction and the
    course1 numbers stay comparable.  `align_gauge` first removes one
    global SE(2) (the standard Umeyama-style ATE alignment) — use it for
    at-scale runs where the unobservable gauge heading dominates the raw
    error (see gauge_align_se2).
    """
    slam = np.asarray(slam_track, np.float64)[:, :2]
    true = np.asarray(true_track, np.float64)[:, :2]
    if align_gauge and len(slam) >= 3:
        from tpuslam.graph.submaps import fit_se2

        th, t = fit_se2(slam, true)     # time-corresponded: no NN needed
        c, s = np.cos(th), np.sin(th)
        slam = slam @ np.array([[c, -s], [s, c]]).T + t
    err = np.linalg.norm(slam - true, axis=1)
    return float(np.sqrt(np.mean(err**2)))


def pose_nees(slam_pose, true_pose, P_pose) -> np.ndarray:
    """Per-step normalized estimation error squared of the xy position.

    Chi-square consistency: for a consistent filter, mean NEES over Monte
    Carlo runs is near the state dimension (2 here).
    """
    e = np.asarray(slam_pose)[:, :2] - np.asarray(true_pose)[:, :2]
    out = np.empty(len(e))
    for t in range(len(e)):
        out[t] = e[t] @ np.linalg.solve(P_pose[t][:2, :2], e[t])
    return out


def gauge_align_se2(est_points, true_points, radius: float = 2.0,
                    iters: int = 64):
    """One GLOBAL SE(2) aligning an estimated point set onto truth.

    SLAM's gauge freedom: only pose 0 is pinned (the prior), so the
    map's absolute orientation rests on the integrated heading — an
    early 0.5 deg heading error displaces a point 250 m away by 2.2 m
    with the map internally perfect (measured: a 0.57 deg global
    rotation was the whole difference between coverage 0.47 and 0.86 on
    a 2k-landmark field).  Standard trajectory/map evaluation therefore
    aligns with one rigid transform before scoring (the SE(2) analog of
    Umeyama ATE alignment); this is that alignment: `iters` rounds of
    native radius-NN matching + closed-form Kabsch.

    Returns (aligned_points, theta, t) — the correction applied.
    """
    from tpuslam.graph.submaps import fit_se2
    from tpuslam.native import SpatialIndex

    est = np.asarray(est_points, np.float64).reshape(-1, 2)
    true = np.asarray(true_points, np.float64).reshape(-1, 2)
    if len(est) < 3 or len(true) < 3:
        return est, 0.0, np.zeros(2)
    idx = SpatialIndex(true, cell_size=max(radius, 1.0))
    cur = est.copy()
    Rc, tc = np.eye(2), np.zeros(2)
    # Coarse-to-fine ICP, MANY iterations: a pure gauge rotation
    # displaces far-from-pivot points by several gates (0.75 deg x
    # 800 m = 10 m), so matching at the final gate alone never captures
    # them; and because coarse-radius NN pairs are mostly wrong, each
    # Kabsch step recovers only a FRACTION of the remaining rotation
    # (regression dilution) — convergence is geometric in iterations,
    # not one-shot (measured on an internally-sub-meter 20k map:
    # 8 iters recovered th=-0.001 of a true 0.0130 gauge, coverage
    # 0.50; 64 iters recovered 0.0131 exactly, coverage 0.99).  Each
    # iteration is one native NN pass — microseconds per thousand
    # points; the SCORING gate itself is unchanged.
    n_it = max(iters, 1)

    def icp(cur, Rc, tc):
        radii = np.geomspace(max(radius, 4.0 * radius), radius, n_it) \
            if n_it > 1 else [radius]
        for r in radii:
            m = idx.match(cur, float(r))
            ok = m >= 0
            if ok.sum() < 3:
                continue
            th, t = fit_se2(cur[ok], true[m[ok]])
            c, s = np.cos(th), np.sin(th)
            R = np.array([[c, -s], [s, c]])
            cur = cur @ R.T + t
            Rc, tc = R @ Rc, R @ tc + t
        return cur, Rc, tc

    cur, Rc, tc = icp(cur, Rc, tc)
    hit = float((idx.match(cur, radius) >= 0).mean())
    if hit < 0.5 and len(true) >= 200 and len(est) >= 60:
        # ICP stalled — the gauge rotation displaces the far field past
        # the coarse capture radius (measured: a 20k map whose anchors
        # sat 0.25 m p50 from truth scored coverage 0.32 because the
        # aligner returned th=0.000).  Bootstrap with constellation
        # registration (rotation/translation-invariant): register a few
        # local disks of the estimate onto the tiled truth field, keep
        # the hypothesis that registers the whole map best, then ICP
        # from there.  Scoring-side only; the gate is unchanged.
        from tpuslam.graph.placerec import ConstellationDB, ransac_se2

        db = ConstellationDB()
        tiles = []
        ext_lo, ext_hi = true.min(0), true.max(0)
        span = np.maximum(ext_hi - ext_lo, 1.0)
        n_tile = int(np.clip(np.sqrt(len(true) / 300.0), 1, 12))
        tw = span / n_tile
        tid = 0
        for tx in range(n_tile):
            for ty in range(n_tile):
                lo = ext_lo + np.array([tx, ty]) * tw - 15.0
                hi = ext_lo + np.array([tx + 1, ty + 1]) * tw + 15.0
                sel = ((true[:, 0] >= lo[0]) & (true[:, 0] < hi[0])
                       & (true[:, 1] >= lo[1]) & (true[:, 1] < hi[1]))
                if sel.sum() >= 3:
                    tiles.append(np.nonzero(sel)[0])
                    db.add_submap(tid, true[sel])
                    tid += 1
        rng = np.random.default_rng(0)
        best = (hit, cur, Rc, tc)
        for _ in range(6):
            c0 = est[rng.integers(len(est))]
            sub = est[np.linalg.norm(est - c0, axis=1) < 60.0]
            if len(sub) < 30:
                continue
            qi, src, lidx, votes = db.query(sub, src_max=tid)
            if len(qi) < 12:
                continue
            tgt = np.stack([true[tiles[s][l]]
                            for s, l in zip(src, lidx)])
            res = ransac_se2(sub[qi], tgt,
                             weights=votes.astype(np.float64),
                             min_inliers=10)
            if res is None:
                continue
            th, t, _, _ = res
            c, s = np.cos(th), np.sin(th)
            R = np.array([[c, -s], [s, c]])
            cand = est @ R.T + t
            cand, Rb, tb = icp(cand, R, t.copy())
            h = float((idx.match(cand, radius) >= 0).mean())
            if h > best[0]:
                best = (h, cand, Rb, tb)
        _, cur, Rc, tc = best
    return cur, float(np.arctan2(Rc[1, 0], Rc[0, 0])), tc


def map_quality(est_landmarks, true_landmarks, match_radius: float = 2.0,
                align_gauge: bool = False):
    """Map-quality metrics: duplicate-landmark rate and matched-landmark RMSE.

    With `align_gauge`, estimates are first aligned to truth by one
    global SE(2) (gauge_align_se2) — the at-scale scoring mode; absolute
    scoring (the default, used by the course1 bench gate where the field
    is small) additionally punishes the unobservable global gauge.

    The reference's gated-NN association (src/data-association.jl:42-48) can
    mint a duplicate feature when a re-observation's NIS clears gate2, so
    landmark count alone overstates map size.  Each estimated landmark is
    assigned to its nearest true landmark; an estimate farther than
    `match_radius` from every true landmark is *spurious*, and every estimate
    beyond the first claiming the same true landmark is a *duplicate*.

    Returns a dict:
      n_est, n_true      — estimated / true landmark counts
      n_matched_true     — distinct true landmarks covered by >=1 estimate
      n_duplicates       — extra estimates beyond the first per true landmark
      n_spurious         — estimates matching no true landmark
      duplicate_rate     — n_duplicates / max(n_est, 1)
      matched_rmse       — RMSE of matched estimate -> true distances [m]
      coverage           — n_matched_true / n_true
    """
    est = np.asarray(est_landmarks, np.float64).reshape(-1, 2)
    true = np.asarray(true_landmarks, np.float64).reshape(-1, 2)
    if align_gauge:
        est, _, _ = gauge_align_se2(est, true, radius=match_radius)
    n_est, n_true = len(est), len(true)
    if n_est == 0 or n_true == 0:
        return {
            "n_est": n_est, "n_true": n_true, "n_matched_true": 0,
            "n_duplicates": 0, "n_spurious": n_est,
            "duplicate_rate": 0.0, "matched_rmse": float("nan"),
            "coverage": 0.0,
        }
    # Native radius-NN instead of the dense (n_est, n_true) distance
    # matrix — at 24k x 20k that matrix is ~8 GB and took 3 minutes.
    # Decisions agree except exactly AT the gate boundary (the native
    # match is strict `<`, the old dense path was `<=`) — measure-zero
    # in practice; don't chase golden-number drift at the boundary as a
    # regression.
    from tpuslam.native import SpatialIndex

    idx = SpatialIndex(true, cell_size=max(match_radius, 1.0))
    nearest = idx.match(est, match_radius)
    matched = nearest >= 0
    dist = np.full(n_est, np.inf)
    dist[matched] = np.linalg.norm(
        est[matched] - true[nearest[matched]], axis=1)
    claimed = nearest[matched]
    uniq = np.unique(claimed)
    n_dup = int(matched.sum() - len(uniq))
    return {
        "n_est": n_est,
        "n_true": n_true,
        "n_matched_true": int(len(uniq)),
        "n_duplicates": n_dup,
        "n_spurious": int((~matched).sum()),
        "duplicate_rate": n_dup / max(n_est, 1),
        "matched_rmse": (float(np.sqrt(np.mean(dist[matched] ** 2)))
                         if matched.any() else float("nan")),
        "coverage": len(uniq) / n_true,
    }
