"""Grid (large-scale, scatter-free) BA == factor-list BA, dense and sharded.

graph/ba_large.py re-expresses graph/ba.py's Gauss-Newton / landmark-Schur
math in a landmark-major grid layout (one-hot MXU placement, chunked scan,
whitened Schur syrk).  Both encode identical factor sets, so the GN
iterates must agree to float tolerance.
"""

import jax.numpy as jnp
import numpy as np

from tpuslam.graph.ba import gauss_newton
from tpuslam.graph.ba_large import (
    gauss_newton_grid,
    grid_cost,
    grid_to_factor_problem,
    make_grid_ba_problem,
    make_sharded_gauss_newton_grid,
)
from tpuslam.parallel.mesh import make_slam_mesh


def small_problem(M=24, K=10, O=3, seed=3, pad_to=None):
    return make_grid_ba_problem(
        n_landmarks=M, n_poses=K, n_obs=O, extent=100.0, seed=seed,
        pad_to=pad_to, dtype=np.float64,
    )


class TestGridEquivalence:
    def test_grid_gn_matches_factor_gn(self):
        prob, tp, tl = small_problem()
        factor = grid_to_factor_problem(prob)

        want, want_cost = gauss_newton(factor, 8, damping=1e-6)
        got, got_cost = gauss_newton_grid(prob, 8, damping=1e-6, chunk=8)

        np.testing.assert_allclose(
            np.asarray(got.poses), np.asarray(want.poses),
            rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(got.landmarks), np.asarray(want.landmarks),
            rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(float(got_cost), float(want_cost),
                                   rtol=1e-9)

    def test_padding_is_noop(self):
        """Masked landmark slots must not change any active variable."""
        prob, _, _ = small_problem(M=24)
        padded, _, _ = small_problem(M=24, pad_to=40)
        out, _ = gauss_newton_grid(prob, 6, chunk=8)
        out_p, _ = gauss_newton_grid(padded, 6, chunk=8)
        np.testing.assert_allclose(
            np.asarray(out_p.poses), np.asarray(out.poses),
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(out_p.landmarks)[:24], np.asarray(out.landmarks),
            rtol=1e-10, atol=1e-12,
        )
        # Padded slots never move.
        np.testing.assert_array_equal(np.asarray(out_p.landmarks)[24:], 0.0)

    def test_chunking_invariance(self):
        """The chunked scan must not change the math (pure reassociation of
        exact sums in f64)."""
        prob, _, _ = small_problem(M=24)
        a, _ = gauss_newton_grid(prob, 5, chunk=24)
        b, _ = gauss_newton_grid(prob, 5, chunk=4)
        np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                                   rtol=1e-12, atol=1e-13)

    def test_grid_gn_converges(self):
        prob, tp, tl = small_problem(M=64, K=16, O=4, seed=7)
        c0 = float(grid_cost(prob))
        out, cf = gauss_newton_grid(prob, 12, chunk=16)
        assert float(cf) < 0.2 * c0
        err = np.linalg.norm(
            np.asarray(out.poses)[:, :2] - np.asarray(tp)[:, :2], axis=1)
        init = np.linalg.norm(
            np.asarray(prob.poses)[:, :2] - np.asarray(tp)[:, :2], axis=1)
        assert err.mean() < 0.35 * init.mean()
        lm_err = np.linalg.norm(
            np.asarray(out.landmarks) - np.asarray(tl), axis=1)
        assert np.median(lm_err) < 0.3


class TestFlatFactorTerms:
    def test_flat_matches_stacked(self):
        """obs_terms_flat (the scalar-unrolled TPU form) == obs_residual."""
        import jax

        from tpuslam.graph.factors import obs_residual, obs_terms_flat

        rng = np.random.default_rng(0)
        pose = rng.normal(0, 5, (32, 3))
        lm = rng.normal(0, 20, (32, 2))
        z = np.stack([rng.uniform(1, 30, 32), rng.uniform(-3, 3, 32)], -1)
        r, A, B = jax.vmap(obs_residual)(
            jnp.asarray(pose), jnp.asarray(lm), jnp.asarray(z))
        r0, r1, Af, Bf = obs_terms_flat(
            *[jnp.asarray(x) for x in
              (pose[:, 0], pose[:, 1], pose[:, 2], lm[:, 0], lm[:, 1],
               z[:, 0], z[:, 1])])
        np.testing.assert_allclose(np.asarray(r),
                                   np.stack([r0, r1], -1), rtol=1e-12)
        for i in range(2):
            for a in range(3):
                np.testing.assert_allclose(
                    np.asarray(A)[:, i, a],
                    np.asarray(jnp.broadcast_to(Af[i][a], (32,))),
                    rtol=1e-12)
            for k in range(2):
                np.testing.assert_allclose(
                    np.asarray(B)[:, i, k], np.asarray(Bf[i][k]),
                    rtol=1e-12)


class TestF32GaugeStability:
    def test_f32_matches_f64_solution(self):
        """Regression: the gauge mode (rigid rotation/translation about the
        anchor, invisible to all relative factors) must not drift under f32
        accumulation noise.  Guarded by the information-scaled anchor
        prior + Kahan chunk accumulation + Jacobi-equilibrated solve; before
        those, f32 pose error here was ~20x worse than f64."""
        p32, tp, tl = make_grid_ba_problem(
            2000, 48, 4, extent=2000.0, seed=1, dtype=np.float32)
        p64, _, _ = make_grid_ba_problem(
            2000, 48, 4, extent=2000.0, seed=1, dtype=np.float64)
        o32, _ = gauss_newton_grid(p32, 6, chunk=500)
        o64, _ = gauss_newton_grid(p64, 6, chunk=500)
        e32 = np.linalg.norm(
            np.asarray(o32.poses)[:, :2] - np.asarray(tp)[:, :2], axis=1
        ).mean()
        e64 = np.linalg.norm(
            np.asarray(o64.poses)[:, :2] - np.asarray(tp)[:, :2], axis=1
        ).mean()
        assert e32 < 2.0 * e64 + 1e-3


class TestGridSharded:
    def test_sharded_matches_dense(self):
        prob, _, _ = small_problem(M=24, pad_to=40)  # 40 = 8 shards x 5
        want, _ = gauss_newton_grid(prob, 6, chunk=5)

        mesh = make_slam_mesh(n_map=8)
        run = make_sharded_gauss_newton_grid(mesh, 6, chunk=5)
        got = run(prob)

        np.testing.assert_allclose(
            np.asarray(got.poses), np.asarray(want.poses),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(got.landmarks), np.asarray(want.landmarks),
            rtol=1e-8, atol=1e-10,
        )

    def test_sharded_converges(self):
        prob, tp, tl = small_problem(M=62, K=16, O=4, seed=9, pad_to=64)
        c0 = float(grid_cost(prob))
        mesh = make_slam_mesh(n_map=4, n_particle=2)
        run = make_sharded_gauss_newton_grid(mesh, 12, chunk=16)
        out = run(prob)
        cf = float(grid_cost(out))
        assert cf < 0.2 * c0
