"""Golden-trajectory integration test: the jitted TPU-native engine vs the
NumPy float64 oracle on course1.txt with an identical noise stream
(SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.bench.metrics import ate_rmse
from tpuslam.config import course1_config
from tpuslam.sim import oracle
from tpuslam.sim.scene import load_course, make_landmarks
from tpuslam.sim.simulator import (
    draw_noise_arrays,
    init_sim_state,
    run_epochs,
)

N_EPOCHS = 40  # ~360 ticks: enough to accumulate features + associations


@pytest.fixture(scope="module")
def course():
    cfg = course1_config(n_landmarks=20, capacity=32, max_obs=24)
    waypoints = load_course()
    landmarks = make_landmarks(cfg.scene, seed=7)
    noises = draw_noise_arrays(cfg, N_EPOCHS, cfg.scene.n_landmarks, seed=11)
    return cfg, waypoints, landmarks, noises


@pytest.fixture(scope="module")
def oracle_run(course):
    cfg, waypoints, landmarks, noises = course
    return oracle.run_sim(cfg, waypoints, landmarks, *noises)


@pytest.fixture(scope="module")
def engine_run(course):
    cfg, waypoints, landmarks, noises = course
    st0 = init_sim_state(cfg, waypoints, dtype=jnp.float64)
    st, recs = run_epochs(
        cfg,
        jnp.asarray(waypoints, jnp.float64),
        jnp.asarray(landmarks, jnp.float64),
        st0,
        tuple(jnp.asarray(n, jnp.float64) for n in noises),
    )
    return st, recs


def test_trajectory_matches_oracle_f64(course, oracle_run, engine_run):
    cfg, *_ = course
    st, recs = engine_run
    active = np.asarray(recs.active).reshape(-1)
    true_track = np.asarray(recs.true_pose).reshape(-1, 3)[active]
    slam_track = np.asarray(recs.slam_pose).reshape(-1, 3)[active]

    o_true = oracle_run["true_track"]
    o_slam = oracle_run["slam_track"]
    assert len(true_track) == len(o_true)
    np.testing.assert_allclose(true_track, o_true, atol=1e-9)
    np.testing.assert_allclose(slam_track, o_slam, atol=1e-6)


def test_final_state_matches_oracle_f64(course, oracle_run, engine_run):
    st, _ = engine_run
    x_o = oracle_run["x"]
    n_feat = (len(x_o) - 3) // 2
    assert int(st.ekf.n) == n_feat
    np.testing.assert_allclose(
        np.asarray(st.ekf.x)[: len(x_o)], x_o, atol=1e-6
    )
    P = np.asarray(st.ekf.P)[: len(x_o), : len(x_o)]
    np.testing.assert_allclose(P, oracle_run["P"], atol=1e-6)


def test_f32_run_stays_consistent(course):
    """The f32 (TPU-dtype) engine tracks the truth: ATE bound + NEES sanity."""
    cfg, waypoints, landmarks, noises = course
    st0 = init_sim_state(cfg, waypoints, dtype=jnp.float32)
    st, recs = run_epochs(
        cfg,
        jnp.asarray(waypoints, jnp.float32),
        jnp.asarray(landmarks, jnp.float32),
        st0,
        tuple(jnp.asarray(n, jnp.float32) for n in noises),
    )
    active = np.asarray(recs.active).reshape(-1)
    true_track = np.asarray(recs.true_pose).reshape(-1, 3)[active]
    slam_track = np.asarray(recs.slam_pose).reshape(-1, 3)[active]
    ate = ate_rmse(slam_track, true_track)
    assert np.isfinite(ate)
    assert ate < 0.5  # meters; true pose is known at t=0, short run
    # Covariance still symmetric PSD-ish in f32.
    dim = 3 + 2 * int(st.ekf.n)
    P = np.asarray(st.ekf.P)[:dim, :dim]
    np.testing.assert_allclose(P, P.T, atol=1e-5)
    assert np.linalg.eigvalsh(P).min() > -1e-4


def test_tick_unroll_equivalent(course):
    """tick_unroll only changes XLA fusion, not semantics: an unrolled run
    matches the default within compiler-reassociation rounding (identical
    association decisions, rounding-level state difference)."""
    import dataclasses

    cfg, waypoints, landmarks, noises = course
    st0 = init_sim_state(cfg, waypoints, dtype=jnp.float64)
    args = (
        jnp.asarray(waypoints, jnp.float64),
        jnp.asarray(landmarks, jnp.float64),
        st0,
        tuple(jnp.asarray(n, jnp.float64) for n in noises),
    )
    st1, _ = run_epochs(cfg, *args)
    cfg9 = dataclasses.replace(cfg, tick_unroll=cfg.substeps_per_obs)
    st9, _ = run_epochs(cfg9, *args)
    assert int(st1.ekf.n) == int(st9.ekf.n)
    np.testing.assert_allclose(
        np.asarray(st1.ekf.x), np.asarray(st9.ekf.x), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st1.ekf.P), np.asarray(st9.ekf.P), atol=1e-9
    )
