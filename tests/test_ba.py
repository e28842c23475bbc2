"""Pose-graph / BA backend: Jacobians, Schur exactness, convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.graph.ba import (
    BAProblem,
    _pose_only_terms,
    _schur_terms,
    gauss_newton,
    total_cost,
)
from tpuslam.graph.factors import obs_residual, odo_residual
from tpuslam.graph.keyframes import simulate_ba_problem


def to_jnp(prob):
    return jax.tree.map(jnp.asarray, prob)


class TestFactorJacobians:
    def test_obs_jacobians_vs_autodiff(self):
        pose = jnp.array([1.0, 2.0, 0.4])
        lm = jnp.array([8.0, -3.0])
        z = jnp.array([7.5, -0.9])
        _, A, B = obs_residual(pose, lm, z)
        A_ad = jax.jacfwd(lambda p: obs_residual(p, lm, z)[0])(pose)
        B_ad = jax.jacfwd(lambda l: obs_residual(pose, l, z)[0])(lm)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(B), np.asarray(B_ad), rtol=1e-9)

    def test_odo_jacobians_vs_autodiff(self):
        pi = jnp.array([1.0, 2.0, 0.4])
        pj = jnp.array([2.5, 2.2, 0.7])
        meas = jnp.array([1.4, 0.1, 0.3])
        _, Ji, Jj = odo_residual(pi, pj, meas)
        Ji_ad = jax.jacfwd(lambda p: odo_residual(p, pj, meas)[0])(pi)
        Jj_ad = jax.jacfwd(lambda p: odo_residual(pi, p, meas)[0])(pj)
        np.testing.assert_allclose(np.asarray(Ji), np.asarray(Ji_ad),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(Jj), np.asarray(Jj_ad),
                                   rtol=1e-9)


def circle_problem(K=12, M=15, seed=0):
    th = np.linspace(0, 1.5 * np.pi, K)
    tp = np.stack([30 * np.cos(th), 30 * np.sin(th), th + np.pi / 2], -1)
    rng = np.random.default_rng(seed)
    tl = rng.uniform(-45, 45, (M, 2))
    return simulate_ba_problem(tp, tl, sensor_range=40.0, seed=seed)


class TestSchur:
    def test_schur_equals_direct_solve(self):
        """Landmark elimination must give the same pose update as solving
        the full (poses + landmarks) normal equations directly."""
        prob, tp, tl = circle_problem()
        prob = to_jnp(prob)
        K = prob.poses.shape[0]
        M = prob.landmarks.shape[0]
        damping = 1e-8

        Hpp_o, bp_o = _pose_only_terms(prob.poses, prob)
        Hpp_red, bp_red, bl, Hll_inv, G2 = _schur_terms(
            prob.poses, prob.landmarks, prob, damping
        )
        H = Hpp_o + Hpp_red + damping * jnp.eye(3 * K)
        dp = np.linalg.solve(np.asarray(H), np.asarray(bp_o + bp_red))

        # Direct full system.
        from tpuslam.graph.ba import _obs_terms, _odo_terms

        r, A, B = _obs_terms(prob.poses, prob.landmarks, prob)
        r, A, B = map(np.asarray, (r, A, B))
        op, ol = np.asarray(prob.obs_p), np.asarray(prob.obs_l)
        n = 3 * K + 2 * M
        Hf = np.zeros((n, n))
        bf = np.zeros(n)
        for f in range(len(r)):
            Jrow = np.zeros((2, n))
            Jrow[:, 3 * op[f]:3 * op[f] + 3] = A[f]
            Jrow[:, 3 * K + 2 * ol[f]:3 * K + 2 * ol[f] + 2] = B[f]
            Hf += Jrow.T @ Jrow
            bf += Jrow.T @ r[f]
        ro, Ji, Jj = _odo_terms(prob.poses, prob)
        ro, Ji, Jj = map(np.asarray, (ro, Ji, Jj))
        oi, oj = np.asarray(prob.odo_i), np.asarray(prob.odo_j)
        for f in range(len(ro)):
            Jrow = np.zeros((3, n))
            Jrow[:, 3 * oi[f]:3 * oi[f] + 3] = Ji[f]
            Jrow[:, 3 * oj[f]:3 * oj[f] + 3] = Jj[f]
            Hf += Jrow.T @ Jrow
            bf += Jrow.T @ ro[f]
        P0 = np.asarray(prob.prior_sqrt_info.T @ prob.prior_sqrt_info)
        Hf[:3, :3] += P0
        Hf += damping * np.eye(n)
        d_full = np.linalg.solve(Hf, bf)

        np.testing.assert_allclose(dp, d_full[: 3 * K], rtol=1e-6, atol=1e-8)

    def test_gauss_newton_converges(self):
        prob, tp, tl = circle_problem()
        probj = to_jnp(prob)
        c0 = float(total_cost(probj))
        out, c_final = gauss_newton(probj, 15)
        assert float(c_final) < 0.2 * c0
        # Poses recover the truth to within measurement noise.
        err = np.linalg.norm(np.asarray(out.poses)[:, :2] - tp[:, :2], axis=1)
        init_err = np.linalg.norm(np.asarray(prob.poses)[:, :2] - tp[:, :2],
                                  axis=1)
        assert err.mean() < 0.35 * init_err.mean()
        # Landmarks improve over the init; weakly-observed ones (1-2 distant
        # sightings) keep larger errors, so bound mean loosely, median tight.
        lm_err = np.linalg.norm(np.asarray(out.landmarks) - tl, axis=1)
        assert lm_err.mean() < 0.5
        assert np.median(lm_err) < 0.3
