"""Landmark-sharded BA == single-device BA on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.graph.ba import gauss_newton, total_cost
from tpuslam.graph.ba_sharded import (
    make_sharded_gauss_newton,
    partition_ba_problem,
)
from tpuslam.parallel.mesh import make_slam_mesh
from tests.test_ba import circle_problem, to_jnp


def test_sharded_gn_matches_dense():
    prob, tp, tl = circle_problem(K=10, M=24, seed=2)

    # Dense reference on the PARTITIONED problem (same factor padding order
    # so the float math is comparable).
    part = partition_ba_problem(prob, 8)
    partj = to_jnp(part)
    want, _ = gauss_newton(partj, 8)

    mesh = make_slam_mesh(n_map=8)
    run = make_sharded_gauss_newton(mesh, 8)
    got = run(partj)

    np.testing.assert_allclose(
        np.asarray(got.poses), np.asarray(want.poses), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.landmarks), np.asarray(want.landmarks),
        rtol=1e-7, atol=1e-9,
    )


def test_sharded_gn_converges():
    prob, tp, tl = circle_problem(K=12, M=32, seed=5)
    part = partition_ba_problem(prob, 4)
    partj = to_jnp(part)
    c0 = float(total_cost(partj))
    mesh = make_slam_mesh(n_map=4, n_particle=2)
    run = make_sharded_gauss_newton(mesh, 12)
    out = run(partj)
    cf = float(total_cost(out))
    assert cf < 0.2 * c0
    err = np.linalg.norm(np.asarray(out.poses)[:, :2] - tp[:, :2], axis=1)
    init = np.linalg.norm(np.asarray(part.poses)[:, :2] - tp[:, :2], axis=1)
    assert err.mean() < 0.5 * init.mean()
