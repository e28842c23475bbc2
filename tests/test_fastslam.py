"""FastSLAM RBPF: unit + statistical closed-loop tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.bench.metrics import ate_rmse
from tpuslam.config import course1_config
from tpuslam.filters.fastslam import (
    effective_sample_size,
    estimate_pose,
    make_pf_state,
    maybe_resample,
    measurement_update,
    predict_particles,
    systematic_resample_indices,
)
from tpuslam.sim.scene import load_course, make_landmarks
from tpuslam.sim.pf_simulator import init_pf_sim_state, run_epochs_pf

R = jnp.diag(jnp.array([0.01, 0.0003]))


def test_make_state_uniform_weights():
    st = make_pf_state([1.0, 2.0, 0.3], 50, 8)
    w = np.exp(np.asarray(st.logw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    assert st.poses.shape == (50, 3)
    assert st.fm.shape == (50, 8, 2)


def test_predict_spreads_particles():
    st = make_pf_state([0.0, 0.0, 0.0], 200, 4, dtype=jnp.float64)
    Q = jnp.diag(jnp.array([0.25, 0.003]))
    st2 = predict_particles(st, 8.0, 0.1, Q, 4.0, 0.025, jax.random.key(0))
    p = np.asarray(st2.poses)
    assert p[:, 0].std() > 0  # speed noise spreads x
    # Mean displacement approx v*dt in heading direction.
    assert abs(p[:, 0].mean() - 8.0 * 0.025 * np.cos(0.1)) < 0.01


def test_measurement_update_new_and_matched():
    st = make_pf_state([0.0, 0.0, 0.0], 10, 8, dtype=jnp.float64)
    z = jnp.asarray([[10.0, 0.2], [5.0, -1.0], [0.0, 0.0]])
    mask = jnp.asarray([True, True, False])
    # First epoch: everything is a new feature.
    st = measurement_update(st, z, mask, R, 4.0, 25.0)
    assert np.all(np.asarray(st.n) == 2)
    fm = np.asarray(st.fm)
    np.testing.assert_allclose(
        fm[0, 0], [10 * np.cos(0.2), 10 * np.sin(0.2)], atol=1e-9
    )
    # Second epoch, same observations: should match, not duplicate.
    st2 = measurement_update(st, z, mask, R, 4.0, 25.0)
    assert np.all(np.asarray(st2.n) == 2)
    # Covariance should shrink after a second look.
    assert np.trace(np.asarray(st2.fP)[0, 0]) < np.trace(np.asarray(st.fP)[0, 0])
    # Weights stay normalized.
    np.testing.assert_allclose(
        np.exp(np.asarray(st2.logw)).sum(), 1.0, rtol=1e-6
    )


def test_systematic_resample_proportional():
    logw = jnp.log(jnp.asarray([0.7, 0.1, 0.1, 0.1]))
    counts = np.zeros(4)
    for s in range(200):
        idx = np.asarray(
            systematic_resample_indices(logw, jax.random.key(s))
        )
        counts += np.bincount(idx, minlength=4)
    frac = counts / counts.sum()
    np.testing.assert_allclose(frac, [0.7, 0.1, 0.1, 0.1], atol=0.05)


def test_maybe_resample_triggers_on_degenerate_weights():
    st = make_pf_state([0.0, 0.0, 0.0], 8, 4)
    st = st._replace(
        logw=jnp.asarray([0.0, -50, -50, -50, -50, -50, -50, -50],
                         jnp.float32),
        poses=st.poses.at[0].set(jnp.asarray([9.0, 9.0, 0.5], jnp.float32)),
    )
    assert float(effective_sample_size(st.logw)) < 1.5
    st2 = maybe_resample(st, jax.random.key(0))
    # All survivors should be copies of particle 0.
    np.testing.assert_allclose(
        np.asarray(st2.poses), np.tile([9.0, 9.0, 0.5], (8, 1)), atol=1e-6
    )
    assert float(effective_sample_size(st2.logw)) == pytest.approx(8.0)


def test_closed_loop_course1_ate():
    """Config-3 shape: 100 particles on course1; ATE must stay bounded."""
    cfg = course1_config(n_landmarks=15, capacity=24, max_obs=16)
    wp = jnp.asarray(load_course(), jnp.float64)
    lm = jnp.asarray(make_landmarks(cfg.scene, seed=3), jnp.float64)
    st0 = init_pf_sim_state(cfg, wp, 100, jax.random.key(1), dtype=jnp.float64)
    st, recs = run_epochs_pf(cfg, wp, lm, st0, 60, jax.random.key(2))
    active = np.asarray(recs.active).reshape(-1)
    tt = np.asarray(recs.true_pose).reshape(-1, 3)[active]
    ss = np.asarray(recs.slam_pose).reshape(-1, 3)[active]
    assert active.sum() == 540
    ate = ate_rmse(ss, tt)
    assert np.isfinite(ate) and ate < 2.0
    # Map should have features and finite covariances.
    assert int(np.asarray(st.pf.n).max()) >= 5
    assert np.isfinite(np.asarray(st.pf.fP)).all()
    w = np.exp(np.asarray(st.pf.logw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)


def test_duplicate_merge_bound_vs_sequential():
    """Bound the duplicate-gated-observation merge approximation
    (filters/fastslam.py map update: mean deltas sum against the PRIOR
    covariance; the first match's posterior covariance wins) against the
    exact sequential 2x2 EKF updates — VERDICT r1 weak #6 / ADVICE #5.

    Two properties: (a) single observation is EXACT (no merge involved);
    (b) with two observations of the same feature in one epoch the merged
    mean stays within a small fraction of the innovation scale and the
    merged covariance is CONSERVATIVE (>= sequential posterior in the PSD
    order — the approximation over-states, never under-states,
    uncertainty)."""
    import numpy as np

    from tpuslam.filters.fastslam import PFState, measurement_update

    dtype = jnp.float64
    R = np.diag([0.01, 0.0001])

    def run_engine(obs):
        pose = jnp.asarray([0.0, 0.0, 0.0], dtype)
        fm = jnp.zeros((1, 4, 2), dtype).at[0, 0].set(
            jnp.asarray([10.0, 0.0]))
        fP = jnp.zeros((1, 4, 2, 2), dtype).at[0, 0].set(0.5 * jnp.eye(2))
        st = PFState(poses=pose[None], fm=fm, fP=fP,
                     logw=jnp.zeros((1,), dtype),
                     n=jnp.asarray([1], jnp.int32),
                     cnt=jnp.zeros((1, 4), jnp.int32))
        z = jnp.zeros((4, 2), dtype).at[: len(obs)].set(
            jnp.asarray(obs, dtype))
        zm = jnp.arange(4) < len(obs)
        out = measurement_update(st, z, zm, jnp.asarray(R, dtype),
                                 16.0, 25.0)
        return np.asarray(out.fm[0, 0]), np.asarray(out.fP[0, 0])

    def seq_update(m, P, zi):
        r = np.hypot(*m)
        b = np.arctan2(m[1], m[0])
        H = np.array([[m[0] / r, m[1] / r],
                      [-m[1] / r**2, m[0] / r**2]])
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        v = np.array([zi[0] - r, zi[1] - b])
        return m + K @ v, (np.eye(2) - K @ H) @ P

    # (a) single observation: exact.
    m1, P1 = run_engine([[10.15, 0.012]])
    ms, Ps = seq_update(np.array([10.0, 0.0]), 0.5 * np.eye(2),
                        [10.15, 0.012])
    np.testing.assert_allclose(m1, ms, atol=1e-9)
    np.testing.assert_allclose(P1, Ps, atol=1e-9)

    # (b) duplicate-gated pair: bounded mean, conservative covariance.
    obs = [[10.15, 0.012], [9.88, -0.01]]
    m2, P2 = run_engine(obs)
    ms, Ps = seq_update(np.array([10.0, 0.0]), 0.5 * np.eye(2), obs[0])
    ms, Ps = seq_update(ms, Ps, obs[1])
    v_scale = max(abs(10.15 - 10.0), abs(9.88 - 10.0))
    assert np.linalg.norm(m2 - ms) < 0.2 * v_scale
    eigs = np.linalg.eigvalsh(P2 - Ps)
    assert eigs.min() > -1e-12      # conservative in the PSD order


def test_maintain_maps_merge_and_prune():
    """Per-particle map maintenance (VERDICT r2 weak #3): near-coincident
    duplicates merge by uniform covariance intersection; negative-evidence
    features prune; survivors compact to the slot prefix; singletons pass
    through bit-exactly."""
    from tpuslam.filters.fastslam import PFState, maintain_maps

    dtype = jnp.float64
    # Particle with 4 features: 0 and 2 are duplicates of one landmark,
    # 1 is isolated/healthy, 3 has negative evidence (to be pruned).
    fm = jnp.zeros((1, 6, 2), dtype).at[0, :4].set(
        jnp.asarray([[10.0, 0.0], [30.0, 5.0], [10.3, 0.2], [50.0, 50.0]])
    )
    fP = jnp.zeros((1, 6, 2, 2), dtype)
    fP = fP.at[0, 0].set(jnp.asarray([[0.5, 0.1], [0.1, 0.4]]))
    fP = fP.at[0, 1].set(0.2 * jnp.eye(2))
    fP = fP.at[0, 2].set(jnp.asarray([[0.25, 0.0], [0.0, 0.8]]))
    fP = fP.at[0, 3].set(0.3 * jnp.eye(2))
    st = PFState(
        poses=jnp.zeros((1, 3), dtype),
        fm=fm, fP=fP,
        logw=jnp.zeros((1,), dtype),
        n=jnp.asarray([4], jnp.int32),
        cnt=jnp.asarray([[5, 3, 2, -1, 0, 0]], jnp.int32),
    )
    out = maintain_maps(st, merge_radius=1.0, prune_below=0)

    assert int(out.n[0]) == 2          # {0,2} merged, 1 kept, 3 pruned
    ofm = np.asarray(out.fm[0])
    ofP = np.asarray(out.fP[0])
    ocnt = np.asarray(out.cnt[0])

    # Slot 0: CI-uniform merge of features 0 and 2.
    L0 = np.linalg.inv(np.asarray(fP[0, 0]))
    L2 = np.linalg.inv(np.asarray(fP[0, 2]))
    Lm = 0.5 * (L0 + L2)
    em = 0.5 * (L0 @ np.asarray(fm[0, 0]) + L2 @ np.asarray(fm[0, 2]))
    mu = np.linalg.solve(Lm, em)
    np.testing.assert_allclose(ofm[0], mu, rtol=1e-10)
    np.testing.assert_allclose(ofP[0], np.linalg.inv(Lm), rtol=1e-10)
    assert ocnt[0] == 7                # evidence sums over members
    # CI is conservative: merged covariance >= info-fusion covariance.
    eigs = np.linalg.eigvalsh(ofP[0] - np.linalg.inv(L0 + L2))
    assert eigs.min() > 0

    # Slot 1: the isolated feature, moved up bit-exactly.
    np.testing.assert_array_equal(ofm[1], np.asarray(fm[0, 1]))
    np.testing.assert_array_equal(ofP[1], np.asarray(fP[0, 1]))
    assert ocnt[1] == 3

    # Freed slots are exactly zero (the engine's inactive-slot invariant).
    np.testing.assert_array_equal(ofm[2:], 0.0)
    np.testing.assert_array_equal(ofP[2:], 0.0)
    np.testing.assert_array_equal(ocnt[2:], 0)


def test_maintain_maps_transitive_chain():
    """A drift-smeared chain a-b-c (a~b and b~c adjacent, a-c not) merges
    into ONE feature via the pointer-doubling transitive closure."""
    from tpuslam.filters.fastslam import PFState, maintain_maps

    dtype = jnp.float64
    fm = jnp.zeros((1, 4, 2), dtype).at[0, :3].set(
        jnp.asarray([[0.0, 0.0], [0.9, 0.0], [1.8, 0.0]])
    )
    fP = jnp.zeros((1, 4, 2, 2), dtype).at[0, :3].set(
        jnp.broadcast_to(0.4 * jnp.eye(2), (3, 2, 2))
    )
    st = PFState(
        poses=jnp.zeros((1, 3), dtype), fm=fm, fP=fP,
        logw=jnp.zeros((1,), dtype), n=jnp.asarray([3], jnp.int32),
        cnt=jnp.asarray([[2, 2, 2, 0]], jnp.int32),
    )
    out = maintain_maps(st, merge_radius=1.0, prune_below=0)
    assert int(out.n[0]) == 1
    np.testing.assert_allclose(np.asarray(out.fm[0, 0]), [0.9, 0.0],
                               atol=1e-12)
    assert int(out.cnt[0, 0]) == 6


def test_evidence_counter_tracks_matches_and_misses():
    """Counter: +1 per matched obs, 2 on creation, -1 on an expected-but-
    missed sighting; a feature behind the vehicle is NOT penalized."""
    st = make_pf_state([0.0, 0.0, 0.0], 3, 8, dtype=jnp.float64)
    z = jnp.asarray([[10.0, 0.0], [5.0, 1.0]])
    mask = jnp.asarray([True, True])
    st = measurement_update(st, z, mask, R, 4.0, 25.0, sensor_range=30.0)
    np.testing.assert_array_equal(np.asarray(st.cnt[0, :2]), [2, 2])

    # Second epoch: only the first landmark is re-observed; the second is
    # inside the visibility region and unmatched -> -1.
    z2 = jnp.asarray([[10.0, 0.0], [0.0, 0.0]])
    mask2 = jnp.asarray([True, False])
    st2 = measurement_update(st, z2, mask2, R, 4.0, 25.0, sensor_range=30.0)
    np.testing.assert_array_equal(np.asarray(st2.cnt[0, :2]), [3, 1])

    # A feature BEHIND the vehicle (negative x, heading 0) is not penalized.
    st3 = st._replace(fm=st.fm.at[:, 1].set(jnp.asarray([-5.0, 0.0])))
    st4 = measurement_update(st3, z2, mask2, R, 4.0, 25.0, sensor_range=30.0)
    assert int(st4.cnt[0, 1]) == 2
