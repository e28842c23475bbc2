"""SE(2) pose-graph unbend (graph/pgo.py) — constellation loop edges +
Gauss-Newton over submap anchors.

Reference anchor: the reference has no pose graph (its only correction
is the EKF update, src/ekf.jl:46-77); this layer is the from-scratch
scaling architecture's loop-closure solve (VERDICT r4 tasks 1-2)."""

import numpy as np
import pytest

from tpuslam.graph.pgo import constellation_loop_edges, pgo_se2, pgo_unbend
from tpuslam.graph.submaps import ClosedSubmap, se2_compose, _wrap


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    field = rng.uniform(0, 300, (3000, 2))
    true_anchors = [np.array([50.0, 50.0, 0.0])]
    hops = [(30, 0, 0), (30, 0, 0), (30, 0, np.pi / 2), (0, 30, np.pi / 2),
            (0, 30, np.pi), (-30, 0, np.pi), (-30, 0, -np.pi / 2),
            (0, -30, -np.pi / 2)]
    for dx, dy, th in hops:
        a = true_anchors[-1]
        true_anchors.append(np.array([a[0] + dx, a[1] + dy, th]))
    true_anchors = np.asarray(true_anchors)
    subs = []
    for i, a in enumerate(true_anchors):
        sel = np.linalg.norm(field - a[:2], axis=1) < 40
        pts = field[sel]
        c, s = np.cos(a[2]), np.sin(a[2])
        locl = ((pts - a[:2]) @ np.array([[c, s], [-s, c]]).T
                + rng.normal(0, 0.05, (int(sel.sum()), 2)))
        if i < len(true_anchors) - 1:
            b = true_anchors[i + 1]
            d = b[:2] - a[:2]
            rel = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                            _wrap(b[2] - a[2])])
        else:
            rel = np.zeros(3)
        subs.append(ClosedSubmap(a.copy(), locl,
                                 np.tile(0.01 * np.eye(2),
                                         (len(locl), 1, 1)),
                                 rel, np.eye(3) * 1e-4))
    return subs, true_anchors, rng


def test_unbend_recovers_bent_chain():
    """A chain with systematic per-hop heading error (bent up to ~16 m)
    must come back to centimeters given constellation loop edges."""
    subs, truth, rng = _scene()
    bent = [truth[0].copy()]
    for i in range(len(subs) - 1):
        rel = subs[i].rel_pose.copy()
        rel[2] += 0.05
        rel[:2] += rng.normal(0, 0.5, 2)
        bent.append(se2_compose(bent[-1], rel))
    bent = np.asarray(bent)
    assert np.linalg.norm((bent - truth)[:, :2], axis=1).max() > 8.0
    anc, n_edges = pgo_unbend(subs, bent, 2.0, gap=3)
    assert n_edges >= 1
    err = np.linalg.norm((anc - truth)[:, :2], axis=1)
    assert err.max() < 0.2


def test_unbend_probe_stride():
    """probe_stride=2 (probe every 2nd submap; the at-scale extraction
    cost lever) must still unbend the bent chain — the PGO needs edges
    ALONG the chain, not one per submap."""
    subs, truth, rng = _scene(seed=4)
    bent = [truth[0].copy()]
    for i in range(len(subs) - 1):
        rel = subs[i].rel_pose.copy()
        rel[2] += 0.05
        rel[:2] += rng.normal(0, 0.5, 2)
        bent.append(se2_compose(bent[-1], rel))
    bent = np.asarray(bent)
    b0 = np.linalg.norm((bent - truth)[:, :2], axis=1)
    assert b0.max() > 8.0
    anc, n_edges = pgo_unbend(subs, bent, 2.0, gap=3, probe_stride=2)
    assert n_edges >= 1
    err = np.linalg.norm((anc - truth)[:, :2], axis=1)
    assert err.max() < 0.5 * b0.max()


def test_noop_on_clean_chain():
    """On an already-correct chain the loop edges agree with the anchors
    and the solve must not move anything meaningfully."""
    subs, truth, _ = _scene(seed=1)
    anc, n_edges = pgo_unbend(subs, truth.copy(), 2.0, gap=3)
    err = np.linalg.norm((anc - truth)[:, :2], axis=1)
    assert err.max() < 0.15


def test_edge_measurement_convention():
    """T_ab from constellation_loop_edges composes a's anchor into b's:
    se2_compose(truth_a, T_ab) == truth_b."""
    subs, truth, _ = _scene(seed=2)
    edges = constellation_loop_edges(subs, truth, gap=3, match_radius=2.0)
    assert edges
    for a, b, z, n_in in edges:
        pred_b = se2_compose(truth[a], z)
        assert np.linalg.norm(pred_b[:2] - truth[b][:2]) < 0.3
        assert abs(_wrap(pred_b[2] - truth[b][2])) < 0.01
        assert n_in >= 12


def test_pgo_se2_trim_rejects_wrong_edge():
    """One adversarial wrong edge among good ones must be trimmed, not
    obeyed."""
    subs, truth, rng = _scene(seed=3)
    edges = constellation_loop_edges(subs, truth, gap=3, match_radius=2.0)
    if not edges:
        pytest.skip("scene produced no loop edges")
    bad = (0, len(subs) - 1, np.array([100.0, -50.0, 0.4]), 50)
    odo = [np.asarray(sm.rel_pose, np.float64) for sm in subs[:-1]]
    anc = pgo_se2(truth.copy(), odo, edges + [bad])
    err = np.linalg.norm((anc - truth)[:, :2], axis=1)
    assert err.max() < 1.0
