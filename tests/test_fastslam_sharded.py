"""Particle-sharded FastSLAM == single-chip FastSLAM (same RNG stream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import course1_config
from tpuslam.parallel.fastslam_sharded import (
    init_pf_sharded_sim_state,
    make_sharded_pf_run,
)
from tpuslam.parallel.mesh import make_slam_mesh
from tpuslam.sim.pf_simulator import init_pf_sim_state, run_epochs_pf
from tpuslam.sim.scene import load_course, make_landmarks

N_EPOCHS = 25
NP = 32  # particles; 8 shards x 4


@pytest.fixture(scope="module")
def setup():
    cfg = course1_config(n_landmarks=12, capacity=16, max_obs=12)
    wp = jnp.asarray(load_course(), jnp.float64)
    lm = jnp.asarray(make_landmarks(cfg.scene, seed=9), jnp.float64)
    return cfg, wp, lm


def test_sharded_pf_matches_single_chip(setup):
    cfg, wp, lm = setup
    key0, key_run = jax.random.key(5), jax.random.key(6)

    # Single chip — but draw proposal noise in n_total/offset mode so the
    # random stream is identical (offset 0 over the full block).
    st0 = init_pf_sim_state(cfg, wp, NP, key0, dtype=jnp.float64)
    st_d, recs_d = run_epochs_pf(cfg, wp, lm, st0, N_EPOCHS, key_run)

    mesh = make_slam_mesh(n_particle=8)
    run = make_sharded_pf_run(cfg, mesh, N_EPOCHS, NP)
    st0s = init_pf_sharded_sim_state(cfg, wp, NP, key0, dtype=jnp.float64)
    st_s, recs_s = run(wp, lm, st0s, key_run)

    np.testing.assert_array_equal(
        np.asarray(recs_d.active), np.asarray(recs_s.active)
    )
    np.testing.assert_allclose(
        np.asarray(recs_s.true_pose), np.asarray(recs_d.true_pose),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(recs_s.slam_pose), np.asarray(recs_d.slam_pose),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(st_s.pf.poses), np.asarray(st_d.pf.poses), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(st_s.pf.fm), np.asarray(st_d.pf.fm), atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(st_s.pf.n), np.asarray(st_d.pf.n)
    )


def test_sharded_pf_two_axis_mesh(setup):
    """Particle sharding composes with an (idle) map axis on the same mesh."""
    cfg, wp, lm = setup
    mesh = make_slam_mesh(n_map=2, n_particle=4)
    run = make_sharded_pf_run(cfg, mesh, 10, NP)
    st0 = init_pf_sharded_sim_state(cfg, wp, NP, jax.random.key(0),
                                    dtype=jnp.float64)
    st, recs = run(wp, lm, st0, jax.random.key(1))
    assert np.isfinite(np.asarray(st.pf.poses)).all()
    w = np.exp(np.asarray(st.pf.logw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
