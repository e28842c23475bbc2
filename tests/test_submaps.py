"""Hierarchical submap EKF-SLAM (graph/submaps.py) — the unbounded-
landmark config-5 architecture.

Reference anchor: the reference's dense EKF grows x/P without bound
(src/ekf.jl:84-122); this layer bounds the dense filter to a submap and
hands global consistency to the anchor-graph BA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.bench.metrics import ate_rmse, map_quality
from tpuslam.config import course1_config
from tpuslam.graph.submaps import (
    SubmapSLAM,
    assemble_global_map,
    build_anchor_ba,
    optimize_anchor_graph,
    se2_compose,
    se2_transform_points,
)
from tpuslam.sim.scene import load_course, make_landmarks


def test_se2_helpers():
    rng = np.random.default_rng(0)
    a = rng.normal(size=3)
    b = rng.normal(size=3)
    c = se2_compose(a, b)
    # Composition via homogeneous matrices.
    def T(p):
        cph, sph = np.cos(p[2]), np.sin(p[2])
        return np.array([[cph, -sph, p[0]], [sph, cph, p[1]], [0, 0, 1]])
    np.testing.assert_allclose(T(c)[:2], (T(a) @ T(b))[:2], atol=1e-12)
    pts = rng.normal(size=(5, 2))
    g = se2_transform_points(a, pts)
    want = (T(a) @ np.concatenate([pts.T, np.ones((1, 5))]))[:2].T
    np.testing.assert_allclose(g, want, atol=1e-12)


def test_single_submap_matches_monolithic():
    """With capacity never filling, the submap runner IS the plain engine
    (chunk keys match a manual chunked run bit-for-bit): same landmark
    count and a trajectory equal up to the global-frame re-anchoring."""
    from tpuslam.sim.simulator import init_sim_state, run_epochs_rng

    cfg = course1_config(n_landmarks=35, capacity=64, max_obs=48)
    wp = jnp.asarray(load_course(), jnp.float32)
    lm = jnp.asarray(make_landmarks(cfg.scene, seed=3), jnp.float32)

    slam = SubmapSLAM(cfg, close_frac=0.99, chunk_epochs=10,
                      dtype=jnp.float32, adaptive_chunks=False)
    key = jax.random.key(7)
    run = slam.run(wp, lm, 40, key)
    assert len(run.submaps) == 1

    # Manual reproduction: same chunk key splits, monolithic filter
    # started at the true pose (the submap filter starts at the origin of
    # the anchor frame == true initial pose frame).
    st = init_sim_state(cfg, wp, dtype=jnp.float32)
    k = key
    poses = []
    for _ in range(4):
        k, kc = jax.random.split(k)
        st, recs = run_epochs_rng(cfg, wp, lm, st, 10, kc)
        poses.append(np.asarray(recs.slam_pose).reshape(-1, 3))
    want = np.concatenate(poses)
    # The submap filter runs in the anchor frame (origin at the true
    # initial pose, rotated by its heading); the runner's composed global
    # output must equal the monolithic global filter tightly.  (Not
    # bit-identical: the frame rotation reorders float ops.)
    np.testing.assert_allclose(run.slam_pose[:, :2], want[:, :2], atol=2e-3)
    assert int(run.submaps[0].lm_local.shape[0]) > 10


def test_submap_course1_loop_closure():
    """Full 2-lap course with capacity-24 submaps (the dense filter can
    never hold the 35-landmark map): the match-optimize alternation must
    recover the complete deduplicated global map."""
    cfg = course1_config(n_landmarks=35, capacity=24, max_obs=48)
    wp = load_course()
    lm = make_landmarks(cfg.scene, seed=3)
    run = SubmapSLAM(cfg, close_frac=0.7, chunk_epochs=8).run(
        wp, lm, 400, jax.random.key(0)
    )
    assert len(run.submaps) >= 4          # forced closures
    for sm in run.submaps:
        assert sm.lm_local.shape[0] <= cfg.capacity
        assert np.isfinite(sm.rel_cov).all()

    a = run.active
    ate = ate_rmse(run.slam_pose[a], run.true_pose[a])
    assert np.isfinite(ate) and ate < 5.0  # dead-reckoned anchor chain

    prob, gids, anchors = optimize_anchor_graph(
        run.submaps, rounds=3, iters=15, match_radius=2.5
    )
    gm = assemble_global_map(run.submaps, anchors, gids,
                             int(prob.lm_mask.sum()))
    mq = map_quality(gm, lm)
    assert mq["coverage"] >= 0.95          # whole scene mapped
    assert mq["n_duplicates"] <= 2         # cross-submap merge worked
    assert mq["n_spurious"] <= 2
    assert mq["matched_rmse"] < 1.5

    # Optimized anchors must beat the dead-reckoned chain on map quality.
    prob0, gids0 = build_anchor_ba(run.submaps, match_radius=2.5)
    gm0 = assemble_global_map(run.submaps, np.asarray(prob0.poses), gids0,
                              int(prob0.lm_mask.sum()))
    mq0 = map_quality(gm0, lm)
    assert (mq["n_duplicates"] + mq["n_spurious"]
            <= mq0["n_duplicates"] + mq0["n_spurious"])


def test_match_submap_landmarks_merges_revisits():
    """Unit-level: two synthetic submaps seeing the same three landmarks
    from different anchors share landmark ids."""
    from tpuslam.graph.submaps import ClosedSubmap, match_submap_landmarks

    lms = np.array([[10.0, 0.0], [0.0, 10.0], [7.0, 7.0]])
    a0 = np.array([0.0, 0.0, 0.0])
    a1 = np.array([2.0, 1.0, 0.3])

    def local(anchor, pts):
        c, s = np.cos(anchor[2]), np.sin(anchor[2])
        R = np.array([[c, -s], [s, c]])
        return (pts - anchor[:2]) @ R

    mk = lambda a, pts: ClosedSubmap(
        anchor0=a, lm_local=local(a, pts),
        lm_cov=np.tile(0.01 * np.eye(2), (len(pts), 1, 1)),
        rel_pose=np.zeros(3), rel_cov=0.01 * np.eye(3),
    )
    sms = [mk(a0, lms), mk(a1, lms + 0.05)]
    gids, table, _ = match_submap_landmarks(sms, [a0, a1], radius=1.0)
    assert len(table) == 3
    np.testing.assert_array_equal(gids[0], gids[1])

    # Registration recovers a translation offset LARGER than the match
    # radius (the drift > spacing case nearest-neighbor cannot close).
    a1_drift = a1 + np.array([4.0, -3.0, 0.0])   # 5 m off, radius 1
    gids2, table2, adj = match_submap_landmarks(
        sms, [a0, a1_drift], radius=1.0, register_radius=10.0,
        min_votes=2,
    )
    assert len(table2) == 3
    np.testing.assert_array_equal(gids2[0], gids2[1])
    np.testing.assert_allclose(adj[1][:2], a1[:2], atol=0.3)


def test_native_match_parity():
    """C++ grid match == NumPy fallback (incl. out-of-radius -> -1)."""
    from tpuslam.native import SpatialIndex

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 50, (200, 2))
    q = np.vstack([pts[:40] + rng.normal(0, 0.2, (40, 2)),
                   [[500.0, 500.0]]])
    idx = SpatialIndex(pts, cell_size=3.0)
    got = idx.match(q, 1.0)

    fb = SpatialIndex.__new__(SpatialIndex)
    fb.points = pts
    fb._handle = None
    want = fb.match(q, 1.0)
    np.testing.assert_array_equal(got, want)
    assert got[-1] == -1


def test_submap_dense_field_matches_monolithic_quality():
    """Dense landmark field with a small submap capacity (the config-5
    shape): adaptive chunking (never run saturated), handover seeding and
    online anchor BA must hold the online estimate and global map at
    monolithic quality.  Regression for the mid-chunk saturation bug
    (a full local map mis-associates unmapped observations and corrupts
    the filter — online ATE was 17 m before the fix, ~1 m after)."""
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.graph.submaps import (
        assemble_global_map as agm,
        optimize_anchor_graph as oag,
    )
    from tpuslam.sim.scene import make_grid_course

    scene = SceneConfig(xmin=0.0, xmax=160.0, ymin=0.0, ymax=160.0,
                        n_landmarks=300, legacy_integer_landmarks=False)
    cfg = SimConfig(scene=scene, capacity=96, max_obs=48)
    wp = make_grid_course(160.0, 4, inset=0.05)
    lm = make_landmarks(scene, seed=4)
    slam = SubmapSLAM(cfg, close_frac=0.7, chunk_epochs=64)
    run = slam.run(wp, lm, 800, jax.random.key(0))
    assert len(run.submaps) >= 3
    a = run.active
    ate = ate_rmse(run.slam_pose[a], run.true_pose[a])
    assert np.isfinite(ate) and ate < 2.5

    prob, gids, anchors = oag(run.submaps, rounds=3, iters=12,
                              match_radius=3.0)
    gm = agm(run.submaps, anchors, gids, int(prob.lm_mask.sum()))
    mq = map_quality(gm, lm)
    # Honest bounds: submapping trades ~2-3x monolithic map RMSE (local
    # drift within each bounded filter, ~1-1.7 m here vs 0.13 monolithic)
    # for unbounded total landmarks; the regression this test guards is
    # the order-of-magnitude corruption (ATE 17 m / 676 spurious), not
    # monolithic-exact accuracy.
    assert mq["n_spurious"] <= 0.1 * len(gm)
    assert mq["matched_rmse"] < 2.0
    assert mq["coverage"] > 0.85
    # Every landmark the vehicle could have seen is in the global map and
    # not grossly duplicated.
    assert len(gm) <= 1.25 * mq["n_matched_true"]


def test_merge_duplicates_and_match_excluding():
    """Union-find duplicate merge: coincident pairs collapse to weighted
    means, isolated points survive; C++ match_excluding == NumPy fallback."""
    from tpuslam.graph.submaps import merge_duplicates
    from tpuslam.native import SpatialIndex

    pts = np.array([[0.0, 0.0], [0.4, 0.0],      # pair A (cluster)
                    [10.0, 10.0],                # isolated
                    [20.0, 0.0], [20.3, 0.2]])   # pair B
    w = np.array([1.0, 3.0, 1.0, 1.0, 1.0])
    merged, remap = merge_duplicates(pts, weights=w, radius=1.0)
    assert len(merged) == 3
    assert remap[0] == remap[1] and remap[3] == remap[4]
    assert remap[2] not in (remap[0], remap[3])
    np.testing.assert_allclose(merged[remap[0]], [0.3, 0.0], atol=1e-12)

    idx = SpatialIndex(pts, cell_size=2.0)
    got = idx.match_excluding(pts, 1.0, np.arange(len(pts)))
    fb = SpatialIndex.__new__(SpatialIndex)
    fb.points = pts
    fb._handle = None
    want = fb.match_excluding(pts, 1.0, np.arange(len(pts)))
    np.testing.assert_array_equal(got, want)
    assert got[2] == -1 and got[0] == 1 and got[1] == 0


def test_merge_duplicates_covisibility_semantics():
    """Evidence-gated assembly merge (VERDICT r3 task 5): a ghost pair
    (same true landmark under two ids, sighted from DIFFERENT submaps)
    merges; true neighbors CO-OBSERVED by one submap stay distinct even
    when they sit closer than the merge radius."""
    from tpuslam.graph.submaps import ClosedSubmap, merge_duplicates_covisibility

    eye = np.tile(0.01 * np.eye(2), (2, 1, 1))
    # Submap A co-observes two true neighbors 1.2 m apart (ids 0, 1).
    sm_a = ClosedSubmap(
        anchor0=np.zeros(3), lm_local=np.array([[0.0, 0.0], [1.2, 0.0]]),
        lm_cov=eye, rel_pose=np.zeros(3), rel_cov=np.eye(3) * 1e-4)
    # Submap B re-observes landmark 0 as a 0.4 m ghost (new id 2) plus a
    # far landmark (id 3).
    sm_b = ClosedSubmap(
        anchor0=np.zeros(3), lm_local=np.array([[0.4, 0.0], [30.0, 0.0]]),
        lm_cov=eye, rel_pose=np.zeros(3), rel_cov=np.eye(3) * 1e-4)
    anchors = np.zeros((2, 3))
    gids = [np.array([0, 1]), np.array([2, 3])]
    merged, remap = merge_duplicates_covisibility(
        [sm_a, sm_b], anchors, gids, 4, radius=2.0)
    assert len(merged) == 3
    assert remap[0] == remap[2], "disjoint-source ghost pair must merge"
    assert remap[0] != remap[1], "co-observed neighbors must stay distinct"
    # merged position is the inverse-variance mean (equal weights here).
    np.testing.assert_allclose(merged[remap[0]], [0.2, 0.0], atol=1e-9)


def test_accept_gates_bound_rotation():
    """The 75 m failure mode: an SE(2) fit pivoting at its matched
    cloud's centroid can move the anchor millimeters while rotating the
    frame 0.2 rad — the acceptance gates must reject on rotation, not
    only on anchor displacement."""
    from tpuslam.config import SimConfig
    from tpuslam.graph.submaps import SubmapSLAM

    slam = SubmapSLAM(SimConfig(), match_radius=2.26, register_radius=20.0)
    anchor = np.array([500.0, 400.0, 1.0])
    near = anchor + np.array([0.2, -0.1, 0.001])
    rot = anchor + np.array([0.2, -0.1, 0.2])
    assert slam.accept_correction(near, anchor)
    assert not slam.accept_correction(rot, anchor)
    slam._last_fix_done = 0
    assert slam.accept_loop(near, anchor, n_in=20, n_pts=100, done=100)
    assert not slam.accept_loop(rot, anchor, n_in=20, n_pts=100, done=100)


def test_vote_topk_rescues_masked_true_offset():
    """The r3 at-scale alias failure: a dense blob mints a vote peak
    TALLER than the true registration offset, argmax-only voting
    surfaces only the alias, the tight-gate test rejects it, and the
    true offset never gets tried.  topk scoring must try the true peak
    and register it."""
    rng = np.random.default_rng(7)
    spread = rng.uniform(0, 60, (30, 2))
    blob_src = np.array([10.0, 50.0]) + 0.2 * rng.standard_normal((12, 2))
    blob_dst = np.array([45.0, 5.0]) + 0.2 * rng.standard_normal((12, 2))
    d_true = np.array([4.0, -3.0])
    src = np.concatenate([spread, blob_src])
    table = np.concatenate([spread + d_true, blob_dst])

    from tpuslam.graph.submaps import _vote_topk, align_submap_to_table

    peaks = _vote_topk(table, src, 60.0, bin_size=1.0, k=6)
    # the alias (blob-to-blob, ~144 concentrated pair votes) out-votes
    # the true offset (~30 votes)
    (d0, v0) = peaks[0]
    assert v0 > 60 and np.hypot(*(np.asarray(d0) - d_true)) > 5.0, \
        "test scene must make the alias the tallest peak"
    assert any(np.hypot(*(np.asarray(d) - d_true)) < 1.0 for d, _ in peaks)

    res = align_submap_to_table(src, table, radius=2.0,
                                register_radius=60.0, topk=6)
    assert res is not None
    th, t, n_in = res
    # the recovered rigid correction must map src onto the table: check
    # the transform moves the spread points to their true positions
    c, s = np.cos(th), np.sin(th)
    moved = src @ np.array([[c, -s], [s, c]]).T + t
    err = np.linalg.norm(moved[:30] - (spread + d_true), axis=1)
    assert np.median(err) < 0.5, f"topk failed to register: {np.median(err)}"

    # argmax-only voting surfaces only the alias and must NOT land the
    # true offset (this is the masking failure the topk path fixes)
    res1 = align_submap_to_table(src, table, radius=2.0,
                                 register_radius=60.0, topk=1)
    if res1 is not None:
        th1, t1, _ = res1
        c, s = np.cos(th1), np.sin(th1)
        moved1 = src @ np.array([[c, -s], [s, c]]).T + t1
        err1 = np.linalg.norm(moved1[:30] - (spread + d_true), axis=1)
        assert np.median(err1) > np.median(err) - 1e-9


def test_online_ba_gate_rejects_poisoned_correction():
    """A GN round poisoned by wrong matches (non-finite or a jump far
    beyond registration + drift bounds) must not move the anchor chain —
    the guard for the 71 m-ATE open-loop failure mode (VERDICT r2 #8)."""
    cfg = course1_config(capacity=64)
    slam = SubmapSLAM(cfg, match_radius=3.0, register_radius=15.0)
    anchor = np.array([10.0, 5.0, 0.3])

    # Legitimate: within drift-since-last-closure (~match_radius).
    assert slam.accept_correction(anchor + np.array([2.0, -1.0, 0.01]),
                                  anchor)
    # Legitimate: a registration-scale shift (<= register_radius).
    assert slam.accept_correction(anchor + np.array([14.0, 0.0, 0.0]),
                                  anchor)
    # Poisoned: NaN / inf from a GN blow-up.
    assert not slam.accept_correction(anchor * np.nan, anchor)
    # Poisoned: a jump past register_radius + 4 * match_radius (27 m) —
    # the old 20x-match_radius gate (60 m) ACCEPTED this.
    assert not slam.accept_correction(anchor + np.array([40.0, 0.0, 0.0]),
                                      anchor)
    # No registration configured: gate is pure drift-scale.
    slam2 = SubmapSLAM(cfg, match_radius=3.0, register_radius=None)
    assert not slam2.accept_correction(anchor + np.array([14.0, 0.0, 0.0]),
                                       anchor)
    assert slam2.accept_correction(anchor + np.array([5.0, 0.0, 0.0]),
                                   anchor)


def test_fit_se2_exact_recovery():
    from tpuslam.graph.submaps import fit_se2

    rng = np.random.default_rng(3)
    src = rng.uniform(-20, 20, (30, 2))
    th_true, t_true = 0.27, np.array([4.0, -2.5])
    c, s = np.cos(th_true), np.sin(th_true)
    dst = src @ np.array([[c, -s], [s, c]]).T + t_true
    th, t = fit_se2(src, dst)
    assert th == pytest.approx(th_true, abs=1e-12)
    np.testing.assert_allclose(t, t_true, atol=1e-12)


def test_align_submap_to_table_recovers_drift():
    """The O(overlap)-per-closure online corrector: a submap drifted by a
    known SE(2) error (beyond the NN gate, inside register_radius) aligns
    back onto the table; fresh territory returns None."""
    from tpuslam.graph.submaps import align_submap_to_table

    rng = np.random.default_rng(5)
    table = rng.uniform(0, 100, (300, 2))
    sub = table[:80] + rng.normal(0, 0.05, (80, 2))
    th, t = -0.02, np.array([3.5, -2.0])       # drift > 1 m gate
    c, s = np.cos(th), np.sin(th)
    drifted = sub @ np.array([[c, -s], [s, c]]).T + t

    res = align_submap_to_table(drifted, table, radius=1.0,
                                register_radius=8.0)
    assert res is not None
    th_c, t_c, n_in = res
    assert n_in >= 40
    # Correction inverts the injected drift: applying it to the drifted
    # cloud must land back on the submap's true positions.
    cc, sc = np.cos(th_c), np.sin(th_c)
    back = drifted @ np.array([[cc, -sc], [sc, cc]]).T + t_c
    assert float(np.median(np.linalg.norm(back - sub, axis=1))) < 0.15

    # Fresh territory (no overlap): no correction.
    far = drifted + 500.0
    assert align_submap_to_table(far, table, radius=1.0,
                                 register_radius=8.0) is None


def test_grid_join_matches_factor_path():
    """build_grid_from_submaps must encode the SAME problem as
    build_anchor_ba: identical whiteners and a Gauss-Newton solution that
    agrees between ba.gauss_newton and ba_large.gauss_newton_grid — the
    correctness anchor for the at-scale pipeline join."""
    from tpuslam.graph.ba import gauss_newton
    from tpuslam.graph.ba_large import gauss_newton_grid
    from tpuslam.graph.submaps import (
        ClosedSubmap,
        build_anchor_ba,
        build_grid_from_submaps,
    )

    rng = np.random.default_rng(11)
    lms = rng.uniform(0, 60, (40, 2))
    anchors_true = np.array([[0.0, 0.0, 0.0], [20.0, 5.0, 0.4],
                             [40.0, -3.0, -0.2]])

    def local(anchor, pts):
        c, s = np.cos(anchor[2]), np.sin(anchor[2])
        return (pts - anchor[:2]) @ np.array([[c, -s], [s, c]])

    sms, prev = [], None
    for a in anchors_true:
        vis = lms[np.linalg.norm(lms - a[:2], axis=1) < 35.0]
        rel = (np.zeros(3) if prev is None
               else np.concatenate([
                   local(prev, a[:2][None])[0],
                   [a[2] - prev[2]]]))
        if prev is not None:
            sms[-1] = sms[-1]._replace(rel_pose=rel)
        sms.append(ClosedSubmap(
            anchor0=a.copy(),
            lm_local=local(a, vis) + rng.normal(0, 0.03, (len(vis), 2)),
            lm_cov=np.tile(0.02 * np.eye(2), (len(vis), 1, 1)),
            rel_pose=np.zeros(3), rel_cov=0.01 * np.eye(3),
        ))
        prev = a

    # Perturbed initial anchors (the thing BA must fix).
    anchors0 = anchors_true + rng.normal(0, 0.3, (3, 3)) * [1, 1, 0.02]
    anchors0[0] = anchors_true[0]

    probf, gidsf = build_anchor_ba(sms, match_radius=2.0,
                                   anchors=anchors0)
    probg, gidsg, M, dropped = build_grid_from_submaps(
        sms, anchors0, match_radius=2.0, chunk=64)
    assert dropped == 0
    assert M == int(probf.lm_mask.sum())
    for gf, gg in zip(gidsf, gidsg):
        np.testing.assert_array_equal(gf, gg)
    np.testing.assert_allclose(np.asarray(probg.obs_sqrt_info),
                               np.asarray(probf.obs_sqrt_info), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(probg.odo_sqrt_info),
                               np.asarray(probf.odo_sqrt_info), rtol=1e-6)

    outf, _ = gauss_newton(probf, 12)
    outg, _ = gauss_newton_grid(probg, 12, chunk=64)
    pf, pg = np.asarray(outf.poses), np.asarray(outg.poses)
    # Both must recover the true anchors (gauge prior weights differ —
    # 1e3 vs information-scaled — so compare against truth, not bitwise).
    assert float(np.abs(pf - anchors_true).max()) < 0.05
    assert float(np.abs(pg - anchors_true).max()) < 0.05
    lf = np.asarray(outf.landmarks)[np.asarray(probf.lm_mask)]
    lg = np.asarray(outg.landmarks)[np.asarray(probg.lm_mask)]
    np.testing.assert_allclose(lf, lg[: len(lf)], atol=0.05)


def test_submap_align_mode_dense_field():
    """online_mode='align' (constant cost per closure) + the on-device
    grid solve must match the 'ba' mode's quality bounds on the dense
    config-5 shape — the pipeline the at-scale runs use."""
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.graph.submaps import optimize_anchor_graph_grid
    from tpuslam.sim.scene import make_grid_course

    scene = SceneConfig(xmin=0.0, xmax=160.0, ymin=0.0, ymax=160.0,
                        n_landmarks=300, legacy_integer_landmarks=False)
    cfg = SimConfig(scene=scene, capacity=96, max_obs=48)
    wp = make_grid_course(160.0, 4, inset=0.05)
    lm = make_landmarks(scene, seed=4)
    slam = SubmapSLAM(cfg, close_frac=0.7, chunk_epochs=64,
                      online_mode="align")
    run = slam.run(wp, lm, 800, jax.random.key(0))
    assert len(run.submaps) >= 3
    a = run.active
    ate = ate_rmse(run.slam_pose[a], run.true_pose[a])
    assert np.isfinite(ate) and ate < 2.5

    prob, gids, anchors = optimize_anchor_graph_grid(
        run.submaps, rounds=2, iters=12, match_radius=3.0, chunk=512)
    gm = assemble_global_map(run.submaps, anchors, gids,
                             int(prob.lm_mask.sum()))
    mq = map_quality(gm, lm)
    assert mq["n_spurious"] <= 0.1 * len(gm)
    assert mq["matched_rmse"] < 2.0
    assert mq["coverage"] > 0.85
    assert len(gm) <= 1.25 * mq["n_matched_true"]


def test_gauge_align_se2_recovers_global_rotation():
    """The at-scale scoring mode: a map rotated 0.6 deg about the origin
    (the measured failure shape — internally perfect, absolutely 'bent')
    must score near-perfectly after gauge alignment."""
    from tpuslam.bench.metrics import gauge_align_se2

    rng = np.random.default_rng(9)
    true = rng.uniform(0, 300, (800, 2))
    th = np.radians(0.6)
    c, s = np.cos(th), np.sin(th)
    est = true @ np.array([[c, -s], [s, c]]).T + [0.3, -0.2]

    mq_abs = map_quality(est, true)
    mq_al = map_quality(est, true, align_gauge=True)
    assert mq_abs["coverage"] < 0.9       # absolute scoring punishes gauge
    assert mq_al["coverage"] > 0.999
    assert mq_al["matched_rmse"] < 1e-6

    aligned, th_c, t_c = gauge_align_se2(est, true)
    assert th_c == pytest.approx(-th, abs=1e-9)


def test_ate_rmse_align_gauge():
    rng = np.random.default_rng(2)
    true = np.concatenate(
        [rng.uniform(0, 100, (50, 2)), np.zeros((50, 1))], axis=1)
    th = 0.01
    c, s = np.cos(th), np.sin(th)
    slam = true.copy()
    slam[:, :2] = true[:, :2] @ np.array([[c, -s], [s, c]]).T + [1.0, 0.5]
    assert ate_rmse(slam, true) > 0.5
    assert ate_rmse(slam, true, align_gauge=True) < 1e-9


def test_gpa_refine_anchors_recovers_perturbed_chain():
    """Generalized-Procrustes sweeps: submaps of a common field with
    per-anchor SE(2) perturbations (beyond what one rigid gauge can
    absorb) must be pulled back into cloud agreement."""
    from tpuslam.graph.submaps import ClosedSubmap, gpa_refine_anchors

    rng = np.random.default_rng(4)
    field = rng.uniform(0, 120, (400, 2))

    def local(anchor, pts):
        c, s = np.cos(anchor[2]), np.sin(anchor[2])
        return (pts - anchor[:2]) @ np.array([[c, -s], [s, c]])

    anchors_true, sms = [], []
    for i in range(6):
        a = np.array([20.0 * i, 60.0 + 5 * (i % 2), 0.3 * (i % 3 - 1)])
        vis = field[np.linalg.norm(field - a[:2], axis=1) < 35.0]
        sms.append(ClosedSubmap(
            anchor0=a.copy(),
            lm_local=local(a, vis) + rng.normal(0, 0.02, (len(vis), 2)),
            lm_cov=np.tile(0.02 * np.eye(2), (len(vis), 1, 1)),
            rel_pose=np.zeros(3), rel_cov=0.01 * np.eye(3)))
        anchors_true.append(a)
    anchors_true = np.asarray(anchors_true)

    pert = anchors_true + rng.normal(0, 1.0, (6, 3)) * [0.5, 0.5, 0.01]
    pert[0] = anchors_true[0]              # gauge held at submap 0

    seen = field[(np.linalg.norm(
        field[None] - anchors_true[:, None, :2], axis=-1) < 35.0).any(0)]
    ref, gids, table = gpa_refine_anchors(
        sms, pert, match_radius=2.0, sweeps=20, rematch_rounds=2)
    gm = assemble_global_map(sms, ref, gids, len(table))
    mq = map_quality(gm, seen, align_gauge=True)
    mq0 = map_quality(
        assemble_global_map(
            sms, pert,
            *_match_for(sms, pert)), seen, align_gauge=True)
    assert mq["matched_rmse"] < 0.1
    assert mq["matched_rmse"] < 0.5 * mq0["matched_rmse"]
    assert mq["coverage"] > 0.95


def _match_for(sms, anchors):
    from tpuslam.graph.submaps import match_submap_landmarks

    gids, table, _ = match_submap_landmarks(sms, anchors, 2.0)
    return gids, len(table)


def test_make_survey_course_blocks():
    from tpuslam.sim.scene import make_survey_course

    wp = make_survey_course(800.0, row_spacing=40.0, block=280.0,
                            inset=0.05)
    # 3x3 blocks, each: 4 perimeter corners + rows; all inside the inset.
    assert wp.min() >= 0.05 * 800 - 1e-9 and wp.max() <= 0.95 * 800 + 1e-9
    # Path length far exceeds one lap of the field (block perimeters).
    path = np.linalg.norm(np.diff(wp, axis=0), axis=1).sum()
    assert path > 9 * 4 * 200  # > nine block perimeters
    # Single block degenerates to perimeter + interior rows.
    wp1 = make_survey_course(260.0, row_spacing=40.0, block=280.0)
    assert len(wp1) >= 4 + 2 * 3


def test_accept_loop_drift_budget():
    """Loop-closure gate: accepts corrections within the superlinear
    drift budget since the last absolute fix, rejects the measured alias
    class (large correction after little travel)."""
    cfg = course1_config(n_landmarks=35, capacity=64, max_obs=48)
    slam = SubmapSLAM(cfg, match_radius=2.26, online_mode="align",
                      register_radius=57.0)
    a = np.zeros(3)
    slam._last_fix_done = 0
    # 16 m after 330 m of travel (epoch 550): the measured REAL closure.
    assert slam.accept_loop(np.array([16.0, 0, 0]), a, 30, 300, done=550)
    # 17 m after only 120 m: bigger than any drift physically accruable.
    assert not slam.accept_loop(np.array([17.0, 0, 0]), a, 30, 300,
                                done=200)
    # Thin support is rejected regardless.
    assert not slam.accept_loop(np.array([1.0, 0, 0]), a, 5, 300,
                                done=550)
