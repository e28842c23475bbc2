"""Place recognition (constellation hashing) — graph/placerec.py.

The drift-independent relocalization candidate source for the submap
engine (VERDICT r4 task 1).  Reference anchor: the reference's only
relocalization mechanism is position-gated data association
(src/data-association.jl:1-51); these tests cover the regime where that
breaks (drift beyond any position gate)."""

import numpy as np
import pytest

from tpuslam.graph.placerec import ConstellationDB, ransac_se2
from tpuslam.graph.submaps import SubmapSLAM, se2_transform_points


def _field(seed=0, n=2000, extent=400.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, extent, (n, 2)), rng


def _make_db(field, rng, n_sub=20, r=60.0, noise=0.1, extent=400.0):
    db = ConstellationDB()
    clouds, centers = [], []
    seen = np.zeros(len(field), bool)
    for i in range(n_sub):
        c = rng.uniform(0.2 * extent, 0.8 * extent, 2)
        centers.append(c)
        sel = np.linalg.norm(field - c, axis=1) < r
        pts = field[sel] + rng.normal(0, noise, (int(sel.sum()), 2))
        clouds.append((pts, np.nonzero(sel)[0]))
        db.add_submap(i, pts, index_mask=~seen[sel])
        seen[sel] = True
    return db, clouds, centers


def _drifted_query(field, c, th, t, rng, r=60.0, noise=0.12):
    """A revisit cloud whose global placement is off by the inverse of
    (th, t): applying (th, t) maps it back onto the field."""
    sel = np.linalg.norm(field - c, axis=1) < r
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    g = (field[sel] - t) @ np.linalg.inv(R).T
    return g + rng.normal(0, noise, g.shape)


def test_recognizes_rotated_translated_revisit():
    field, rng = _field()
    db, clouds, centers = _make_db(field, rng)
    th_true, t_true = 0.07, np.array([55.0, -38.0])
    g = _drifted_query(field, centers[4], th_true, t_true, rng)
    q_idx, src, lidx, votes = db.query(g, src_max=len(clouds))
    assert len(q_idx) >= 30
    tgt = np.stack([clouds[s][0][l] for s, l in zip(src, lidx)])
    res = ransac_se2(g[q_idx], tgt, weights=votes.astype(float))
    assert res is not None
    th, t, mask, n_second = res
    assert abs(th - th_true) < 0.01
    assert np.linalg.norm(t - t_true) < 1.0
    assert mask.sum() >= 20
    # Dominance: the true place wins by a wide margin over any alias.
    assert n_second < 0.5 * mask.sum()


def test_fresh_territory_yields_no_fit():
    field, rng = _field()
    db, clouds, _ = _make_db(field, rng)
    # A cloud of the same density that matches NO mapped constellation.
    g = rng.uniform(1000.0, 1120.0, (300, 2))
    q_idx, src, lidx, votes = db.query(g, src_max=len(clouds))
    if len(q_idx) >= 8:  # random hash collisions may nominate pairs...
        tgt = np.stack([clouds[s][0][l] for s, l in zip(src, lidx)])
        res = ransac_se2(g[q_idx], tgt, weights=votes.astype(float))
        assert res is None  # ...but no rigid-consistent subset survives


def test_temporal_gap_filter():
    field, rng = _field()
    db, clouds, centers = _make_db(field, rng, n_sub=5)
    g = _drifted_query(field, centers[4], 0.05, np.array([40.0, 10.0]), rng)
    # src_max=1 admits only submap 0; unless the query region overlaps
    # submap 0, candidates collapse versus the full-db query.
    q_full = db.query(g, src_max=5)[0]
    q_gap = db.query(g, src_max=1)[0]
    assert len(q_gap) <= len(q_full)
    src_full = db.query(g, src_max=5)[1]
    assert (db.query(g, src_max=1)[1] < 1).all() if len(q_gap) else True
    assert (src_full < 5).all()


def test_ransac_rejects_unstructured_correspondences():
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 100, (80, 2))
    dst = rng.uniform(0, 100, (80, 2))  # no rigid relation
    assert ransac_se2(src, dst) is None


def test_reloc_probe_recovers_beyond_budget_drift():
    """End-to-end probe on a hand-built SubmapSLAM state: a revisit
    cloud displaced ~70 m (far past any drift budget at this travel)
    must be relocalized by constellation matching + verified against
    the old table segment."""
    from types import SimpleNamespace

    field, rng = _field(seed=5)
    eng = SubmapSLAM.__new__(SubmapSLAM)  # probe needs no cfg/jax state
    eng.match_radius = 3.0
    eng.reloc_gap = 3
    eng.reloc_min_inliers = 18
    eng._constel = ConstellationDB()

    from tpuslam.graph.submaps import ClosedSubmap

    submaps = []
    table, src_rows = [], []
    seen = np.zeros(len(field), bool)
    centers = [np.array([80.0, 80.0]), np.array([160.0, 120.0]),
               np.array([240.0, 160.0]), np.array([320.0, 200.0]),
               np.array([200.0, 300.0]), np.array([100.0, 320.0])]
    for i, c in enumerate(centers):
        sel = np.linalg.norm(field - c, axis=1) < 60
        pts = field[sel] + rng.normal(0, 0.08, (int(sel.sum()), 2))
        # anchor at the region center; lm_local relative to it
        sm = ClosedSubmap(
            anchor0=np.array([c[0], c[1], 0.0]),
            lm_local=pts - c,
            lm_cov=np.tile(0.01 * np.eye(2), (len(pts), 1, 1)),
            rel_pose=np.zeros(3), rel_cov=np.eye(3) * 1e-4)
        submaps.append(sm)
        new = ~seen[sel]
        eng._constel.add_submap(i, sm.lm_local, index_mask=new)
        table.append(pts[new])
        src_rows.append(np.full(int(new.sum()), i))
        seen[sel] = True
    eng._table = np.concatenate(table)
    eng._table_src = np.concatenate(src_rows)

    # Revisit of submap 1's region, placed 70 m off with 0.1 rad twist.
    th_true, t_true = 0.1, np.array([66.0, -24.0])
    g = _drifted_query(field, centers[1], th_true, t_true, rng, noise=0.1)
    loc = g - g.mean(0)  # any rigid frame works for the descriptors
    res = eng._reloc_probe(submaps, loc, g, i=6, done=1000)
    assert res is not None
    th, t, n_in = res
    assert n_in >= 18
    # The correction maps the drifted cloud back onto the field.
    c_, s_ = np.cos(th), np.sin(th)
    gg = g @ np.array([[c_, s_], [-s_, c_]]) + t
    sel = np.linalg.norm(field - centers[1], axis=1) < 60
    d = np.linalg.norm(gg.mean(0) - field[sel].mean(0))
    assert d < 1.5
    # And the acceptance gate passes it (no drift budget involved).
    anchor = np.array([*g.mean(0), 0.0])
    cand = np.array([*gg.mean(0), th])
    assert eng.accept_reloc(cand, anchor, n_in)


def test_reloc_probe_abstains_without_overlap():
    from tpuslam.graph.submaps import ClosedSubmap

    field, rng = _field(seed=7)
    eng = SubmapSLAM.__new__(SubmapSLAM)
    eng.match_radius = 3.0
    eng.reloc_gap = 3
    eng.reloc_min_inliers = 18
    eng._constel = ConstellationDB()
    c = np.array([100.0, 100.0])
    sel = np.linalg.norm(field - c, axis=1) < 60
    pts = field[sel]
    eng._constel.add_submap(0, pts - c)
    eng._table = pts.copy()
    eng._table_src = np.zeros(len(pts), np.int64)
    submaps = [ClosedSubmap(np.array([100.0, 100.0, 0.0]), pts - c,
                            np.tile(0.01 * np.eye(2), (len(pts), 1, 1)),
                            np.zeros(3), np.eye(3) * 1e-4)]
    g = rng.uniform(600, 720, (250, 2))  # unmapped territory
    assert eng._reloc_probe(submaps, g - g.mean(0), g, i=5,
                            done=100) is None
