"""Unit tests for tpuslam.core against the NumPy oracle and autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.core.geometry import (
    inbounds,
    initial_pose,
    local_to_global,
    mpi_to_pi,
)
from tpuslam.core.motion import motion_jacobians, steer, step_vehicle
from tpuslam.core.observation import (
    predict_observation,
    predict_observation_xy,
)
from tpuslam.sim import oracle


class TestMpiToPi:
    @pytest.mark.parametrize(
        "phi", [0.0, 1.0, -1.0, np.pi, -np.pi, 3.5, -3.5, np.pi + 1e-9]
    )
    def test_matches_oracle(self, phi):
        assert float(mpi_to_pi(phi)) == pytest.approx(oracle.mpi_to_pi(phi))

    def test_single_branch_semantics(self):
        # The reference applies at most ONE 2*pi correction.
        assert float(mpi_to_pi(7.0)) == pytest.approx(7.0 - 2 * np.pi)
        assert float(mpi_to_pi(-7.0)) == pytest.approx(-7.0 + 2 * np.pi)


class TestLocalToGlobal:
    def test_rotation_translation(self, rng):
        pts = rng.standard_normal((5, 2))
        pose = np.array([1.0, -2.0, 0.7])
        got = np.asarray(local_to_global(pts, pose))
        c, s = np.cos(0.7), np.sin(0.7)
        R = np.array([[c, -s], [s, c]])
        want = pts @ R.T + pose[:2]
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_pose_transform_wraps_heading(self):
        pts = np.array([[0.0, 0.0, 3.0]])
        pose = np.array([0.0, 0.0, 1.0])
        got = np.asarray(local_to_global(pts, pose))
        assert got[0, 2] == pytest.approx(4.0 - 2 * np.pi)


def test_inbounds():
    b = (0.0, 100.0, 0.0, 50.0)
    assert bool(inbounds(jnp.array([5.0, 5.0]), b))
    assert not bool(inbounds(jnp.array([-1.0, 5.0]), b))
    assert not bool(inbounds(jnp.array([5.0, 51.0]), b))


def test_initial_pose():
    wp = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    p = np.asarray(initial_pose(wp))
    np.testing.assert_allclose(p, [0.0, 0.0, np.pi / 4], rtol=1e-12)


class TestObservationModel:
    def test_matches_oracle(self, rng):
        x = np.concatenate([[1.0, 2.0, 0.5], rng.uniform(0, 50, 8)])
        for idf in range(4):
            z_o, H_o = oracle.predict_observation(x, idf)
            z, Hp, Hf = predict_observation(jnp.asarray(x), idf)
            np.testing.assert_allclose(np.asarray(z), z_o, rtol=1e-12)
            fpos = 3 + 2 * idf
            np.testing.assert_allclose(np.asarray(Hp), H_o[:, :3], rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(Hf), H_o[:, fpos:fpos + 2], rtol=1e-12
            )

    def test_jacobian_vs_autodiff(self):
        pose = jnp.array([1.0, 2.0, 0.3])
        feat = jnp.array([10.0, -4.0])

        def obs(pose, feat):
            z, _, _ = predict_observation_xy(pose, feat)
            return z

        Hp_ad = jax.jacfwd(obs, argnums=0)(pose, feat)
        Hf_ad = jax.jacfwd(obs, argnums=1)(pose, feat)
        _, Hp, Hf = predict_observation_xy(pose, feat)
        np.testing.assert_allclose(np.asarray(Hp), np.asarray(Hp_ad),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(Hf), np.asarray(Hf_ad),
                                   rtol=1e-9)


class TestMotion:
    def test_step_vehicle_matches_oracle(self):
        pose = np.array([3.0, 4.0, 0.3])
        got = np.asarray(step_vehicle(jnp.asarray(pose), 8.0, 0.2, 4.0, 0.025))
        want = oracle.step_vehicle(pose, 8.0, 0.2, 4.0, 0.025)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_motion_jacobians_vs_autodiff(self):
        phi, v, g, wb, dt = 0.4, 8.0, 0.1, 4.0, 0.025

        def motion(pose, controls):
            return step_vehicle(pose, controls[0], controls[1], wb, dt)

        pose = jnp.array([0.0, 0.0, phi])
        controls = jnp.array([v, g])
        Gv_ad = jax.jacfwd(motion, argnums=0)(pose, controls)
        Gu_ad = jax.jacfwd(motion, argnums=1)(pose, controls)
        Gv, Gu = motion_jacobians(phi, v, g, wb, dt)
        np.testing.assert_allclose(np.asarray(Gv), np.asarray(Gv_ad),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(Gu), np.asarray(Gu_ad),
                                   rtol=1e-9)

    def test_steer_matches_oracle(self, rng):
        wp = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
        params = dict(d_min=1.0, dt=0.025, steer_rate=1.0, max_gamma=1.0)
        for _ in range(50):
            pose = np.array(
                [rng.uniform(-2, 12), rng.uniform(-2, 12), rng.uniform(-3, 3)]
            )
            gamma = rng.uniform(-1, 1)
            iwp = int(rng.integers(0, 3))
            g_o, i_o = oracle.steer(pose, gamma, iwp, wp, **params)
            g_j, i_j = steer(
                jnp.asarray(pose), gamma, jnp.int32(iwp), jnp.asarray(wp),
                params["d_min"], params["dt"], params["steer_rate"],
                params["max_gamma"],
            )
            assert int(i_j) == i_o
            assert float(g_j) == pytest.approx(g_o, rel=1e-12)

    def test_steer_finish_keeps_gamma(self):
        # Reaching past the last waypoint leaves gamma unchanged (early
        # return in the reference, src/common.jl:203-207).
        wp = np.array([[0.0, 0.0], [10.0, 0.0]])
        pose = jnp.array([10.0, 0.2, 0.0])  # within d_min of last waypoint
        g, iwp = steer(pose, 0.33, jnp.int32(1), jnp.asarray(wp),
                       1.0, 0.025, 1.0, 1.0)
        assert int(iwp) == -1
        assert float(g) == pytest.approx(0.33)
