"""Sharded (Schur-reduction) EKF == dense EKF, on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.filters.ekf import add_features, predict, update
from tpuslam.parallel.ekf_sharded import (
    from_dense,
    make_sharded_add_features,
    make_sharded_predict,
    make_sharded_update,
    to_dense,
)
from tpuslam.parallel.mesh import make_slam_mesh
from tests.test_ekf import random_filter_state, to_fixed

CAP = 16  # divisible by 8 shards


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_slam_mesh(n_map=8)


def dense_state(rng, n_feat):
    x_o, P_o = random_filter_state(rng, n_feat)
    return to_fixed(x_o, P_o, cap=CAP)


def test_roundtrip(rng):
    st = dense_state(rng, 5)
    back = to_dense(from_dense(st))
    np.testing.assert_array_equal(np.asarray(back.x), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(back.P), np.asarray(st.P))
    assert int(back.n) == int(st.n)


def test_sharded_predict_matches_dense(rng, mesh):
    st = dense_state(rng, 6)
    Q = jnp.diag(jnp.array([0.25, 0.003]))
    want = predict(st, 8.3, 0.12, 4.0, Q, 0.025)
    fn = make_sharded_predict(mesh)
    got = to_dense(fn(from_dense(st), 8.3, 0.12, 4.0, Q, 0.025))
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(want.P),
                               atol=1e-12)


@pytest.mark.parametrize("n_feat,n_obs", [(4, 2), (12, 6), (16, 8)])
def test_sharded_update_matches_dense(rng, mesh, n_feat, n_obs):
    from tpuslam.sim import oracle

    st = dense_state(rng, n_feat)
    x_np = np.asarray(st.x)
    R = jnp.diag(jnp.array([0.01, 0.0003]))
    # Spread associated features across shards.
    idf_o = rng.choice(n_feat, size=n_obs, replace=False).astype(np.int32)
    x_dyn = x_np[: 3 + 2 * n_feat]
    zf = np.stack(
        [oracle.predict_observation(x_dyn, j)[0] for j in idf_o]
    ) + rng.standard_normal((n_obs, 2)) * [0.1, 0.01]

    max_nz = n_obs + 3
    z = np.zeros((max_nz, 2))
    z[:n_obs] = zf
    mask = np.zeros(max_nz, bool)
    mask[:n_obs] = True
    idf = np.zeros(max_nz, np.int32)
    idf[:n_obs] = idf_o

    want = update(st, jnp.asarray(z), jnp.asarray(mask), jnp.asarray(idf), R)
    fn = make_sharded_update(mesh)
    got = to_dense(
        fn(from_dense(st), jnp.asarray(z), jnp.asarray(mask),
           jnp.asarray(idf), R)
    )
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(want.P),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n_feat,n_new", [(0, 3), (5, 4), (13, 5)])
def test_sharded_augment_matches_dense(rng, mesh, n_feat, n_new):
    st = dense_state(rng, n_feat)
    R = jnp.diag(jnp.array([0.01, 0.0003]))
    max_new = n_new + 2
    z = np.zeros((max_new, 2))
    z[:n_new] = np.stack(
        [rng.uniform(1, 25, n_new), rng.uniform(-np.pi, np.pi, n_new)],
        axis=-1,
    )
    mask = np.zeros(max_new, bool)
    mask[:n_new] = True

    want = add_features(st, jnp.asarray(z), jnp.asarray(mask), R)
    fn = make_sharded_add_features(mesh)
    got = to_dense(
        fn(from_dense(st), jnp.asarray(z), jnp.asarray(mask), R)
    )
    assert int(got.n) == int(want.n)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(want.P),
                               rtol=1e-10, atol=1e-12)
