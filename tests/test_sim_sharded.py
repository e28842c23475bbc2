"""Full sharded closed-loop run == dense single-chip run (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import course1_config
from tpuslam.parallel.ekf_sharded import to_dense
from tpuslam.parallel.mesh import make_slam_mesh
from tpuslam.parallel.sim_sharded import (
    init_sharded_sim_state,
    make_sharded_run,
)
from tpuslam.sim.scene import load_course, make_landmarks
from tpuslam.sim.simulator import draw_noise_arrays, init_sim_state, run_epochs

N_EPOCHS = 30


@pytest.fixture(scope="module")
def setup():
    cfg = course1_config(n_landmarks=16, capacity=24, max_obs=16)
    waypoints = load_course()
    landmarks = make_landmarks(cfg.scene, seed=5)
    noises = draw_noise_arrays(cfg, N_EPOCHS, cfg.scene.n_landmarks, seed=13)
    return cfg, waypoints, landmarks, noises


def test_sharded_run_matches_dense(setup):
    cfg, waypoints, landmarks, noises = setup
    wp = jnp.asarray(waypoints, jnp.float64)
    lm = jnp.asarray(landmarks, jnp.float64)
    nz = tuple(jnp.asarray(n, jnp.float64) for n in noises)

    # Dense single-device run.
    st_d, recs_d = run_epochs(
        cfg, wp, lm, init_sim_state(cfg, wp, dtype=jnp.float64), nz
    )

    # Sharded run over the full 8-device mesh.
    mesh = make_slam_mesh(n_map=8)
    run = make_sharded_run(cfg, mesh)
    st_s, recs_s = run(
        wp, lm, init_sharded_sim_state(cfg, wp, dtype=jnp.float64), nz
    )

    np.testing.assert_array_equal(
        np.asarray(recs_d.active), np.asarray(recs_s.active)
    )
    np.testing.assert_allclose(
        np.asarray(recs_s.true_pose), np.asarray(recs_d.true_pose),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(recs_s.slam_pose), np.asarray(recs_d.slam_pose),
        atol=1e-7,
    )

    dense_s = to_dense(st_s.ekf)
    assert int(dense_s.n) == int(st_d.ekf.n)
    np.testing.assert_allclose(
        np.asarray(dense_s.x), np.asarray(st_d.ekf.x), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(dense_s.P), np.asarray(st_d.ekf.P), atol=1e-7
    )


def test_sharded_run_bf16_map_storage(setup):
    """bf16 storage of the row-sharded Pmm (the 100k-landmark memory
    budget, init_sharded_sim_state map_dtype) must track the f32 run: same
    course completion, finite covariance, and a close trajectory.  All
    algebra stays f32 — only the Pmm tiles round on write."""
    from tpuslam.bench.metrics import ate_rmse

    cfg, waypoints, landmarks, noises = setup
    wp = jnp.asarray(waypoints, jnp.float32)
    lm = jnp.asarray(landmarks, jnp.float32)
    nz = tuple(jnp.asarray(n, jnp.float32) for n in noises)

    mesh = make_slam_mesh(n_map=8)
    run = make_sharded_run(cfg, mesh)
    outs = {}
    for name, map_dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        st, recs = run(
            wp, lm,
            init_sharded_sim_state(cfg, wp, dtype=jnp.float32,
                                   map_dtype=map_dtype),
            nz,
        )
        if map_dtype is not None:
            assert st.ekf.Pmm.dtype == jnp.bfloat16
        dense = to_dense(st.ekf)
        assert np.isfinite(np.asarray(dense.P)).all()
        a = np.asarray(recs.active).reshape(-1)
        tt = np.asarray(recs.true_pose).reshape(-1, 3)[a]
        ss = np.asarray(recs.slam_pose).reshape(-1, 3)[a]
        outs[name] = (ate_rmse(ss, tt), int(st.ekf.n))

    ate32, n32 = outs["f32"]
    ate16, n16 = outs["bf16"]
    assert n16 == n32                     # same map built
    assert ate16 < max(2.0 * ate32, ate32 + 0.25)


def test_sharded_run_two_axis_mesh(setup):
    """Map sharding composes with an outer (idle) particle axis."""
    cfg, waypoints, landmarks, noises = setup
    wp = jnp.asarray(waypoints, jnp.float64)
    lm = jnp.asarray(landmarks, jnp.float64)
    nz = tuple(jnp.asarray(n, jnp.float64) for n in noises)

    mesh = make_slam_mesh(n_map=4, n_particle=2)
    run = make_sharded_run(cfg, mesh)
    st_s, recs_s = run(
        wp, lm, init_sharded_sim_state(cfg, wp, dtype=jnp.float64), nz
    )
    assert np.isfinite(np.asarray(to_dense(st_s.ekf).P)).all()
    assert int(st_s.ekf.n) > 0


def test_ring_panel_exchange_matches_allgather(setup):
    """The ring-ppermute gain-panel circulation must equal the all_gather
    formulation (same per-element contractions, different exchange)."""
    cfg, waypoints, landmarks, noises = setup
    wp = jnp.asarray(waypoints, jnp.float64)
    lm = jnp.asarray(landmarks, jnp.float64)
    nz = tuple(jnp.asarray(n, jnp.float64) for n in noises)
    mesh = make_slam_mesh(n_map=8)
    st0 = init_sharded_sim_state(cfg, wp, dtype=jnp.float64)

    run_ag = make_sharded_run(cfg, mesh, panel_exchange="allgather")
    run_ring = make_sharded_run(cfg, mesh, panel_exchange="ring")
    st_a, recs_a = run_ag(wp, lm, st0, nz)
    st_r, recs_r = run_ring(wp, lm, st0, nz)

    np.testing.assert_allclose(
        np.asarray(recs_r.slam_pose), np.asarray(recs_a.slam_pose),
        atol=1e-9,
    )
    da, dr = to_dense(st_a.ekf), to_dense(st_r.ekf)
    assert int(da.n) == int(dr.n)
    np.testing.assert_allclose(np.asarray(dr.x), np.asarray(da.x),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(dr.P), np.asarray(da.P),
                               atol=1e-9)


def test_fp16_map_storage_long_horizon():
    """Reduced-precision Pmm storage past the old NaN horizon (VERDICT r1
    next-step #7): fp16 storage + default periodic PSD repair + the
    S-Cholesky retry ladder keeps a 220-epoch 1k-landmark run (the config
    that NaN'd at ~45 epochs in round 1) finite AND tracking.

    bf16 (u = 2^-9) remains a documented negative result: its quantization
    exceeds the posterior PSD margin and the trajectory diverges even
    though the ladder keeps it finite — see
    parallel/ekf_fused_sharded.psd_repair_local and PERF.md."""
    from tpuslam.bench.metrics import ate_rmse
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.parallel.sim_sharded import make_sharded_run_rng
    from tpuslam.sim.scene import make_grid_course

    scene = SceneConfig(xmin=0.0, xmax=300.0, ymin=0.0, ymax=300.0,
                        n_landmarks=1000, legacy_integer_landmarks=False)
    cfg = SimConfig(scene=scene, capacity=1024, max_obs=48)
    wp = jnp.asarray(make_grid_course(300.0, n_per_side=6, inset=0.1),
                     jnp.float32)
    lm = jnp.asarray(make_landmarks(scene, seed=4), jnp.float32)
    mesh = make_slam_mesh(n_map=8)
    N = 220

    runner = make_sharded_run_rng(cfg, mesh, N)  # default repair cadence
    st0 = init_sharded_sim_state(cfg, wp, dtype=jnp.float32,
                                 map_dtype=jnp.float16)
    st, recs = jax.block_until_ready(runner(wp, lm, st0, jax.random.key(7)))

    sp = np.asarray(recs.slam_pose).reshape(-1, 3)
    assert np.isfinite(sp).all()
    a = np.asarray(recs.active).reshape(-1)
    tt = np.asarray(recs.true_pose).reshape(-1, 3)
    ate = ate_rmse(sp[a], tt[a])
    assert np.isfinite(ate) and ate < 4.0  # f32 run: ~1.9 m on this course
    dense = to_dense(st.ekf)
    assert np.isfinite(np.asarray(dense.x)).all()
    assert int(st.ekf.n) > 150  # the map actually built out
