"""Hierarchical submap EKF-SLAM (graph/submaps.py) — the unbounded-
landmark config-5 architecture.

Reference anchor: the reference's dense EKF grows x/P without bound
(src/ekf.jl:84-122); this layer bounds the dense filter to a submap and
hands global consistency to the anchor-graph BA.
"""

import jax
import jax.numpy as jnp
import numpy as np

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
