"""SE(2) pose-graph optimization over submap anchors with
place-recognition loop edges — the assembly-stage unbender.

Why this exists (VERDICT r4 tasks 1-2, measured on bent 20k runs): when
early drift bakes into the online table before the first revisit, the
anchor chain is SMOOTHLY BENT — every submap is locally consistent with
its neighbors, so no per-submap greedy re-registration can move anything
(measured: a 3-sweep leave-self-out reconcile moved 7 of 293 anchors on
a run sitting at coverage 0.38), and assembly-side re-matching inherits
the bend (0.38 -> 0.39).  Unbending requires a GLOBAL solve whose loop
constraints connect revisits to first visits ACROSS the bend — and
those constraints cannot come from position-gated matching (the bend
exceeds the gate; that is what bent the map).  They come from place
recognition: constellation correspondences between two submaps' LOCAL
clouds (graph/placerec.py) are anchor-independent, and a pairwise
rigid RANSAC fit between the local frames is a centimeter-grade
relative-pose measurement

    T_ab  =  pose of submap b's anchor frame expressed in a's frame,

exactly an odometry-style factor between non-consecutive anchors.  The
pose graph = odometry chain (each submap's rel_pose, the existing
factors) + these loop edges; Gauss-Newton distributes the loop residual
over the chain, which is the classical loop-closure unbend (Lu-Milios).

The solver is dense NumPy float64 on host: anchors number ~10^2-10^3
(one per submap, NOT per tick), so the normal equations are a few
thousand square — milliseconds, no accelerator round-trip, and no
recompile-per-closure (the anchor count changes every closure; see
optimize_anchor_graph's on_host note).  The 1M-landmark-scale work
stays in the landmark-major grid BA (ba_large.py); this graph never
touches landmarks.

Reference anchor: the reference has no pose graph at all (its only map
correction is the EKF update, src/ekf.jl:46-77); this is part of the
from-scratch scaling architecture, reference-anchored only through the
submap layer it serves.
"""

from __future__ import annotations

import numpy as np

from tpuslam.graph.submaps import _wrap, fit_se2, se2_transform_points

__all__ = ["constellation_loop_edges", "pgo_se2", "pgo_unbend"]


def constellation_loop_edges(submaps, anchors=None, *, gap: int = 3,
                             min_pair_candidates: int = 8,
                             min_inliers: int = 12,
                             inlier_tol: float = 1.0,
                             max_edges_per_submap: int = 4,
                             match_radius: float = 2.0,
                             constel_bin: float = 0.25,
                             probe_stride: int = 1,
                             db=None, log=None):
    """Anchor-independent relative-pose loop edges between submap pairs.

    For each submap b, constellation candidates against all submaps
    a <= b - gap are grouped by source; each (a, b) pair with enough
    candidates gets a rigid RANSAC fit IN LOCAL FRAMES (loc_a vs loc_b
    — no anchors involved), and a fit with >= min_inliers becomes the
    edge (a, b, T_ab, n_inliers) with T_ab = pose of b's frame in a's
    frame.  Inlier counts are the edge weights for the PGO.

    probe_stride probes every k-th submap as a query (sources still
    index ALL first-seen landmarks, so any submap can be a TARGET): the
    wall is the query loop, and the unbend only needs loop edges spread
    along the chain, not one per submap — at 10^3-10^4-anchor scale a
    stride-2/3 probe keeps hundreds-to-thousands of edges.  Default 1
    (probe everything).

    Returns list of (a, b, meas (3,), n_in).
    """
    from tpuslam.graph.placerec import ConstellationDB, ransac_se2

    S = len(submaps)
    loc = [np.asarray(sm.lm_local, np.float64).reshape(-1, 2)
           for sm in submaps]
    if db is None:
        # First-observer-only indexing: indexing every observation of
        # every landmark multiplies bucket density by the observation
        # count (measured ~9 s/query at 20k vs tens of ms first-seen),
        # and for loop edges the first observer is exactly the pass a
        # revisit should link to.  `anchors` only seeds the first-seen
        # bookkeeping; descriptors themselves are anchor-independent.
        from tpuslam.graph.submaps import match_submap_landmarks

        if anchors is None:
            from tpuslam.graph.submaps import se2_compose

            anchors = [np.asarray(submaps[0].anchor0, np.float64)]
            for sm in submaps[:-1]:
                anchors.append(se2_compose(anchors[-1], sm.rel_pose))
        gids0, _, _ = match_submap_landmarks(
            submaps, np.asarray(anchors), match_radius)
        n_t = 1 + max((int(np.max(g)) for g in gids0 if len(g)),
                      default=0)
        seen = np.zeros(n_t, bool)
        db = ConstellationDB(bin_size=constel_bin)
        for i in range(S):
            if not len(loc[i]):
                continue
            ids = np.asarray(gids0[i], np.int64)
            mask = ~seen[ids]
            seen[ids] = True
            db.add_submap(i, loc[i], index_mask=mask)
    edges = []
    stride = min(6, 1 + db.n_entries // 1_500_000)
    for b in range(gap, S):
        if probe_stride > 1 and b % probe_stride:
            continue
        if len(loc[b]) < min_inliers:
            continue
        q_idx, src, lidx, votes = db.query(
            loc[b], src_max=b - gap + 1, max_candidates=600,
            center_stride=stride)
        if not len(q_idx):
            continue
        # Strongest source submaps first.
        srcs, counts = np.unique(src, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        n_made = 0
        for a in srcs[order]:
            if n_made >= max_edges_per_submap:
                break
            m = src == a
            if int(m.sum()) < min_pair_candidates:
                continue
            a = int(a)
            res = ransac_se2(
                loc[b][q_idx[m]], loc[a][lidx[m]],
                weights=votes[m].astype(np.float64),
                min_inliers=min_inliers, inlier_tol=inlier_tol)
            if res is None:
                continue
            th, t, mask, n_second = res
            n_in = int(mask.sum())
            if n_second > 0.5 * n_in:
                continue  # ambiguous pair — not edge material
            # p_a = R(th) p_b + t  =>  T_ab = (t, th): b's frame in a's.
            edges.append((a, b, np.array([t[0], t[1], th]), n_in))
            n_made += 1
        if log and b % 200 == 0:
            log(f"loop edges: submap {b}/{S}, {len(edges)} so far")
    return edges


def pgo_se2(anchors, odo_meas, loop_edges, *, iters: int = 25,
            odo_sigma=(0.3, 0.3, 0.01), loop_sigma=(0.05, 0.05, 0.002),
            trim: float = 2.0, trim_rounds: int = 2, damping: float = 1e-6):
    """Dense Gauss-Newton SE(2) pose-graph solve (gauge: pose 0 fixed).

    anchors: (S, 3) initial poses.  odo_meas: (S-1, 3) consecutive
    relative poses (submap rel_pose chain; sigma ~ the local filter's
    per-submap drift, NOT sensor noise).  loop_edges: list of (a, b,
    meas (3,), n_in) from constellation_loop_edges; each is weighted by
    sqrt(n_in) on top of loop_sigma (more inliers = tighter fit).

    Robustness is TRIM, not Huber: with a bent initial chain the loop
    residuals start tens of meters — any residual-normed reweighting
    (Huber) crushes exactly the constraints that do the unbending and
    the solve stalls (measured: coverage 0.38 -> 0.35 on a bent 20k
    chain with Huber on; 0.38 -> 0.93 with trim).  The measured edge
    population supports it: 99.7 % of constellation edges sit within
    2 m of truth (p50 0.135 m), so solve non-robustly, drop edges whose
    METRIC residual exceeds `trim` meters, and re-solve.

    Residual per edge (a, b, z): r = T_a^{-1} T_b - z in (R_a^T (t_b -
    t_a) - z_t, wrap(th_b - th_a - z_th)) form; Jacobians analytic.
    Returns (S, 3) optimized poses.
    """
    P = np.asarray(anchors, np.float64).reshape(-1, 3).copy()
    S = len(P)
    if S < 2:
        return P
    odo = [(i, i + 1, np.asarray(odo_meas[i], np.float64),
            1.0 / np.asarray(odo_sigma, np.float64))
           for i in range(S - 1)]
    loops = [(int(a), int(b), np.asarray(z, np.float64),
              np.sqrt(max(n_in, 1)) / np.asarray(loop_sigma, np.float64))
             for a, b, z, n_in in loop_edges]

    def residual(P, a, b, z):
        ca, sa = np.cos(P[a, 2]), np.sin(P[a, 2])
        dt = P[b, :2] - P[a, :2]
        return np.array([ca * dt[0] + sa * dt[1] - z[0],
                         -sa * dt[0] + ca * dt[1] - z[1],
                         _wrap(P[b, 2] - P[a, 2] - z[2])])

    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.linalg import spsolve
        have_scipy = True
    except Exception:  # pragma: no cover - scipy is in the image
        have_scipy = False

    def solve(P, edges, iters):
        """Vectorized GN: all edges assembled batch-wise; the sparsity
        pattern is fixed across iterations (indices precomputed once)."""
        A = np.asarray([e[0] for e in edges])
        B = np.asarray([e[1] for e in edges])
        Z = np.asarray([e[2] for e in edges])
        W = np.asarray([e[3] for e in edges])
        E = len(edges)
        # Block index grids for the four 3x3 blocks per edge.
        ii, jj = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
        base_a = 3 * A[:, None, None]
        base_b = 3 * B[:, None, None]
        rows = np.concatenate([
            (base_a + ii).ravel(), (base_b + ii).ravel(),
            (base_a + ii).ravel(), (base_b + ii).ravel()])
        cols = np.concatenate([
            (base_a + jj).ravel(), (base_b + jj).ravel(),
            (base_b + jj).ravel(), (base_a + jj).ravel()])
        for _ in range(iters):
            ca, sa = np.cos(P[A, 2]), np.sin(P[A, 2])
            dtx = P[B, 0] - P[A, 0]
            dty = P[B, 1] - P[A, 1]
            r = np.stack([
                ca * dtx + sa * dty - Z[:, 0],
                -sa * dtx + ca * dty - Z[:, 1],
                _wrap(P[B, 2] - P[A, 2] - Z[:, 2])], axis=1)
            Ja = np.zeros((E, 3, 3))
            Jb = np.zeros((E, 3, 3))
            Ja[:, 0, 0] = -ca
            Ja[:, 0, 1] = -sa
            Ja[:, 1, 0] = sa
            Ja[:, 1, 1] = -ca
            Ja[:, 0, 2] = -sa * dtx + ca * dty
            Ja[:, 1, 2] = -ca * dtx - sa * dty
            Ja[:, 2, 2] = -1.0
            Jb[:, 0, 0] = ca
            Jb[:, 0, 1] = sa
            Jb[:, 1, 0] = -sa
            Jb[:, 1, 1] = ca
            Jb[:, 2, 2] = 1.0
            JaW = W[:, :, None] * Ja
            JbW = W[:, :, None] * Jb
            rW = W * r
            HAA = np.einsum("eri,erj->eij", JaW, JaW)
            HBB = np.einsum("eri,erj->eij", JbW, JbW)
            HAB = np.einsum("eri,erj->eij", JaW, JbW)
            vals = np.concatenate([
                HAA.ravel(), HBB.ravel(), HAB.ravel(),
                np.transpose(HAB, (0, 2, 1)).ravel()])
            g = np.zeros(3 * S)
            np.add.at(g, (3 * A[:, None] + np.arange(3)).ravel(),
                      np.einsum("eri,er->ei", JaW, rW).ravel())
            np.add.at(g, (3 * B[:, None] + np.arange(3)).ravel(),
                      np.einsum("eri,er->ei", JbW, rW).ravel())
            # Gauge: clamp pose 0 (drop its rows/cols, identity block)
            # + damping on the full diagonal.
            keep = (rows >= 3) & (cols >= 3)
            r2 = np.concatenate([rows[keep], np.arange(3),
                                 np.arange(3 * S)])
            c2 = np.concatenate([cols[keep], np.arange(3),
                                 np.arange(3 * S)])
            v2 = np.concatenate([vals[keep], np.ones(3),
                                 np.full(3 * S, damping)])
            g[:3] = 0.0
            try:
                if have_scipy:
                    H = coo_matrix((v2, (r2, c2)),
                                   shape=(3 * S, 3 * S)).tocsc()
                    dx = spsolve(H, -g)
                else:
                    H = np.zeros((3 * S, 3 * S))
                    np.add.at(H, (r2, c2), v2)
                    dx = np.linalg.solve(H, -g)
            except Exception:
                return P, False
            if not np.isfinite(dx).all():
                return P, False
            P[:, 0] += dx[0::3]
            P[:, 1] += dx[1::3]
            P[:, 2] = _wrap(P[:, 2] + dx[2::3])
            if np.abs(dx).max() < 1e-6:
                break
        return P, True

    keep = loops
    for _ in range(max(trim_rounds, 1)):
        P, ok = solve(P, odo + keep, iters)
        if not ok:
            break
        if not trim:
            break
        kept = [e for e in keep
                if np.linalg.norm(residual(P, e[0], e[1], e[2])[:2])
                < trim]
        if len(kept) == len(keep):
            break
        keep = kept
    return P


def pgo_unbend(submaps, anchors, match_radius: float, *, gap: int = 3,
               min_inliers: int = 12, constel_bin: float = 0.25,
               probe_stride: int = 1, log=None):
    """The full assembly-stage unbend: constellation loop edges + SE(2)
    PGO over the anchor chain.  Returns (anchors_opt, n_edges).

    A chain with no recoverable loop structure returns the input
    anchors unchanged (n_edges counts what was found).
    """
    edges = constellation_loop_edges(
        submaps, anchors, gap=gap, min_inliers=min_inliers,
        match_radius=match_radius, constel_bin=constel_bin,
        probe_stride=probe_stride, log=log)
    if log:
        log(f"pgo: {len(edges)} loop edges over {len(submaps)} anchors")
    if not edges:
        return np.asarray(anchors, np.float64).reshape(-1, 3), 0
    odo = [np.asarray(sm.rel_pose, np.float64) for sm in submaps[:-1]]
    opt = pgo_se2(anchors, odo, edges)
    if not np.isfinite(opt).all():
        return np.asarray(anchors, np.float64).reshape(-1, 3), len(edges)
    return opt, len(edges)
