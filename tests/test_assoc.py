"""Vectorized association vs the oracle's sequential reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.assoc.nn import associate, association_scores
from tests.test_ekf import random_filter_state, to_fixed

R = np.diag([0.01, 0.0003])
GATE1, GATE2 = 4.0, 25.0


def run_both(rng, n_feat, n_obs, obs_sigma, max_nz=10):
    from tpuslam.sim import oracle

    x_o, P_o = random_filter_state(rng, n_feat)
    st = to_fixed(x_o, P_o)

    # Observations: a mix of near-feature and random.
    z_list = []
    for i in range(n_obs):
        if n_feat and i % 2 == 0:
            j = int(rng.integers(n_feat))
            zp, _ = oracle.predict_observation(x_o, j)
            z_list.append(zp + rng.standard_normal(2) * obs_sigma)
        else:
            z_list.append(
                np.array([rng.uniform(1, 30), rng.uniform(-np.pi, np.pi)])
            )
    z_o = np.stack(z_list)

    zf_o, idf_o, zn_o = oracle.associate(x_o, P_o, z_o, R, GATE1, GATE2)

    z = np.zeros((max_nz, 2))
    z[:n_obs] = z_o
    mask = np.zeros(max_nz, bool)
    mask[:n_obs] = True
    idf, matched, new = associate(
        st, jnp.asarray(z), jnp.asarray(mask), jnp.asarray(R), GATE1, GATE2
    )
    return z_o, (zf_o, idf_o, zn_o), (
        np.asarray(idf), np.asarray(matched), np.asarray(new)
    )


class TestAssociate:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_oracle_semantics(self, seed):
        rng = np.random.default_rng(seed)
        n_feat = int(rng.integers(0, 8))
        n_obs = int(rng.integers(1, 9))
        z_o, (zf_o, idf_o, zn_o), (idf, matched, new) = run_both(
            rng, n_feat, n_obs, obs_sigma=np.array([0.2, 0.05])
        )
        # Matched set and targets agree.
        got_pairs = [
            (tuple(z_o[i]), int(idf[i]))
            for i in range(len(z_o)) if matched[i]
        ]
        want_pairs = [(tuple(zf_o[k]), idf_o[k]) for k in range(len(idf_o))]
        assert got_pairs == want_pairs
        # New-feature set agrees (order preserved).
        got_new = [tuple(z_o[i]) for i in range(len(z_o)) if new[i]]
        want_new = [tuple(r) for r in zn_o]
        assert got_new == want_new
        # No obs is both.
        assert not np.any(matched & new)

    def test_empty_map_all_new(self, rng):
        _, (zf_o, idf_o, zn_o), (idf, matched, new) = run_both(
            rng, 0, 5, obs_sigma=np.array([0.1, 0.01])
        )
        assert not matched.any()
        assert new.sum() == 5
        assert len(zn_o) == 5

    def test_masked_obs_ignored(self, rng):
        x_o, P_o = random_filter_state(rng, 3)
        st = to_fixed(x_o, P_o)
        z = jnp.asarray(rng.uniform(1, 20, (6, 2)))
        idf, matched, new = associate(
            st, z, jnp.zeros(6, bool), jnp.asarray(R), GATE1, GATE2
        )
        assert not np.asarray(matched).any()
        assert not np.asarray(new).any()

    def test_scores_match_oracle(self, rng):
        from tpuslam.sim import oracle

        x_o, P_o = random_filter_state(rng, 5)
        st = to_fixed(x_o, P_o)
        z_o = np.stack(
            [rng.uniform(1, 30, 4), rng.uniform(-np.pi, np.pi, 4)], axis=-1
        )
        nis, nd = association_scores(
            st, jnp.asarray(z_o), jnp.ones(4, bool), jnp.asarray(R)
        )
        for i in range(4):
            for j in range(5):
                nis_o, nd_o = oracle.compute_association(x_o, P_o, z_o[i], R, j)
                assert float(nis[i, j]) == pytest.approx(nis_o, rel=1e-8)
                assert float(nd[i, j]) == pytest.approx(nd_o, rel=1e-8)
