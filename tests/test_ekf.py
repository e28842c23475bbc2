"""EKF predict/update/augment vs the NumPy oracle, plus property tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.filters.ekf import add_features, predict, update
from tpuslam.filters.state import EKFState, make_ekf_state
from tpuslam.sim import oracle

CAP = 12


def random_filter_state(rng, n_feat, cap=CAP, spread=30.0):
    """A random but physically plausible joint state + PSD covariance."""
    pose = np.array([rng.uniform(0, 50), rng.uniform(0, 50),
                     rng.uniform(-np.pi, np.pi)])
    feats = pose[:2] + rng.uniform(-spread, spread, (n_feat, 2))
    x_o = np.concatenate([pose, feats.reshape(-1)])
    n = 3 + 2 * n_feat
    A = rng.standard_normal((n, n + 4)) * 0.15
    P_o = A @ A.T + 0.01 * np.eye(n)
    return x_o, P_o


def to_fixed(x_o, P_o, cap=CAP):
    """Embed a dynamic oracle state into the fixed-capacity masked state."""
    n = len(x_o)
    dim = 3 + 2 * cap
    x = np.zeros(dim)
    x[:n] = x_o
    P = np.zeros((dim, dim))
    P[:n, :n] = P_o
    return EKFState(
        x=jnp.asarray(x), P=jnp.asarray(P),
        n=jnp.asarray((n - 3) // 2, jnp.int32),
    )


def from_fixed(state, n_feat):
    n = 3 + 2 * n_feat
    return np.asarray(state.x)[:n], np.asarray(state.P)[:n, :n]


class TestPredict:
    @pytest.mark.parametrize("n_feat", [0, 1, 5])
    def test_matches_oracle(self, rng, n_feat):
        x_o, P_o = random_filter_state(rng, n_feat)
        st = to_fixed(x_o, P_o)
        Q = np.diag([0.25, 0.003])
        v, g, wb, dt = 8.3, 0.12, 4.0, 0.025

        want_x, want_P = oracle.ekf_predict(x_o, P_o, v, g, wb, Q, dt)
        got = predict(st, v, g, wb, jnp.asarray(Q), dt)
        got_x, got_P = from_fixed(got, n_feat)
        np.testing.assert_allclose(got_x, want_x, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(got_P, want_P, rtol=1e-12, atol=1e-12)

    def test_inactive_slots_untouched(self, rng):
        x_o, P_o = random_filter_state(rng, 2)
        st = to_fixed(x_o, P_o)
        got = predict(st, 8.0, 0.1, 4.0, jnp.diag(jnp.array([0.25, 0.003])),
                      0.025)
        assert np.all(np.asarray(got.P)[7:, 7:] == 0)
        assert int(got.n) == 2


class TestUpdate:
    @pytest.mark.parametrize("n_feat,n_obs", [(1, 1), (5, 3), (8, 8)])
    def test_matches_oracle(self, rng, n_feat, n_obs):
        x_o, P_o = random_filter_state(rng, n_feat)
        st = to_fixed(x_o, P_o)
        R = np.diag([0.01, 0.0003])
        idf_o = rng.choice(n_feat, size=n_obs, replace=False).astype(int)
        # Observations near the predicted ones.
        zf = np.stack(
            [oracle.predict_observation(x_o, j)[0] for j in idf_o]
        ) + rng.standard_normal((n_obs, 2)) * [0.1, 0.01]

        want_x, want_P = oracle.ekf_update(x_o, P_o, zf, R, list(idf_o))

        max_nz = 6 if n_obs <= 6 else n_obs  # exercise padding
        z = np.zeros((max_nz, 2))
        z[:n_obs] = zf
        mask = np.zeros(max_nz, bool)
        mask[:n_obs] = True
        idf = np.zeros(max_nz, np.int32)
        idf[:n_obs] = idf_o

        got = update(st, jnp.asarray(z), jnp.asarray(mask),
                     jnp.asarray(idf), jnp.asarray(R))
        got_x, got_P = from_fixed(got, n_feat)
        np.testing.assert_allclose(got_x, want_x, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(got_P, want_P, rtol=1e-8, atol=1e-10)

    def test_all_masked_is_noop(self, rng):
        x_o, P_o = random_filter_state(rng, 4)
        st = to_fixed(x_o, P_o)
        R = jnp.diag(jnp.array([0.01, 0.0003]))
        z = jnp.asarray(rng.standard_normal((5, 2)))
        got = update(st, z, jnp.zeros(5, bool), jnp.zeros(5, jnp.int32), R)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(st.x),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.P), np.asarray(st.P),
                                   atol=1e-12)

    def test_preserves_symmetry_psd(self, rng):
        x_o, P_o = random_filter_state(rng, 6)
        st = to_fixed(x_o, P_o)
        R = np.diag([0.01, 0.0003])
        idf_o = np.arange(4)
        zf = np.stack(
            [oracle.predict_observation(x_o, j)[0] for j in idf_o]
        )
        got = update(st, jnp.asarray(zf), jnp.ones(4, bool),
                     jnp.asarray(idf_o, jnp.int32), jnp.asarray(R))
        P = np.asarray(got.P)[:15, :15]
        np.testing.assert_allclose(P, P.T, atol=1e-12)
        assert np.linalg.eigvalsh(P).min() > -1e-10


class TestAddFeatures:
    @pytest.mark.parametrize("n_feat,n_new", [(0, 1), (0, 3), (4, 2), (2, 5)])
    def test_matches_oracle(self, rng, n_feat, n_new):
        x_o, P_o = random_filter_state(rng, n_feat)
        st = to_fixed(x_o, P_o)
        R = np.diag([0.01, 0.0003])
        zn = np.stack(
            [rng.uniform(1, 25, n_new), rng.uniform(-np.pi, np.pi, n_new)],
            axis=-1,
        )
        want_x, want_P = oracle.ekf_add_features(x_o, P_o, zn, R)

        max_new = n_new + 2  # exercise padding
        z = np.zeros((max_new, 2))
        z[:n_new] = zn
        mask = np.zeros(max_new, bool)
        mask[:n_new] = True

        got = add_features(st, jnp.asarray(z), jnp.asarray(mask),
                           jnp.asarray(R))
        assert int(got.n) == n_feat + n_new
        got_x, got_P = from_fixed(got, n_feat + n_new)
        np.testing.assert_allclose(got_x, want_x, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(got_P, want_P, rtol=1e-10, atol=1e-12)

    def test_interleaved_mask(self, rng):
        """Masked slots interleaved between real ones still append in order."""
        x_o, P_o = random_filter_state(rng, 1)
        st = to_fixed(x_o, P_o)
        R = np.diag([0.01, 0.0003])
        zn = np.array([[5.0, 0.3], [9.0, -1.0]])
        want_x, want_P = oracle.ekf_add_features(x_o, P_o, zn, R)

        z = np.array([[5.0, 0.3], [77.0, 2.0], [9.0, -1.0], [3.0, 0.1]])
        mask = np.array([True, False, True, False])
        got = add_features(st, jnp.asarray(z), jnp.asarray(mask),
                           jnp.asarray(R))
        assert int(got.n) == 3
        got_x, got_P = from_fixed(got, 3)
        np.testing.assert_allclose(got_x, want_x, rtol=1e-12)
        np.testing.assert_allclose(got_P, want_P, rtol=1e-10, atol=1e-12)

    def test_capacity_overflow_drops(self, rng):
        """Features beyond capacity are dropped, not corrupting the state."""
        x_o, P_o = random_filter_state(rng, CAP - 1)
        st = to_fixed(x_o, P_o)
        R = jnp.diag(jnp.array([0.01, 0.0003]))
        z = jnp.asarray([[5.0, 0.3], [9.0, -1.0], [3.0, 0.1]])
        got = add_features(st, z, jnp.ones(3, bool), R)
        # n counts all accepted adds but only slots < CAP hold data; the
        # scatter must not have written out of bounds (no exception, finite).
        assert np.isfinite(np.asarray(got.x)).all()
        assert np.isfinite(np.asarray(got.P)).all()


class TestGrowCapacity:
    def test_grow_preserves_and_continues(self, rng):
        """Growing capacity is exact and the filter continues identically
        (same update on the small and the grown state)."""
        from tpuslam.filters.state import grow_capacity

        x_o, P_o = random_filter_state(rng, 5)
        st = to_fixed(x_o, P_o, cap=8)
        big = grow_capacity(st, 20)
        assert big.capacity == 20
        assert int(big.n) == 5
        np.testing.assert_array_equal(np.asarray(big.x)[:19],
                                      np.asarray(st.x))
        np.testing.assert_array_equal(np.asarray(big.P)[:19, :19],
                                      np.asarray(st.P))
        assert np.all(np.asarray(big.P)[19:, :] == 0)

        R = jnp.diag(jnp.array([0.01, 0.0003]))
        from tpuslam.sim import oracle
        zf = np.stack([oracle.predict_observation(x_o, j)[0]
                       for j in range(3)])
        z = jnp.asarray(zf)
        mask = jnp.ones(3, bool)
        idf = jnp.arange(3, dtype=jnp.int32)
        small_out = update(st, z, mask, idf, R)
        big_out = update(big, z, mask, idf, R)
        np.testing.assert_allclose(
            np.asarray(big_out.x)[:19], np.asarray(small_out.x),
            rtol=1e-9, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(big_out.P)[:19, :19], np.asarray(small_out.P),
            rtol=1e-8, atol=1e-12,
        )

    def test_shrink_rejected(self, rng):
        from tpuslam.filters.state import grow_capacity

        x_o, P_o = random_filter_state(rng, 2)
        st = to_fixed(x_o, P_o, cap=8)
        with pytest.raises(ValueError):
            grow_capacity(st, 4)
