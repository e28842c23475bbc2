"""Pallas kernels (interpret mode on CPU) == XLA references."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.kernels.pht_s import pht_and_s, pht_and_s_ref
from tpuslam.kernels.sym_rank_k import (
    symmetric_rank_k_update,
    symmetric_rank_k_update_ref,
)


@pytest.mark.parametrize("dim,k,block", [(256, 24, 128), (300, 131, 128),
                                         (131, 8, 256)])
def test_sym_rank_k_matches_ref(rng, dim, k, block):
    P = jnp.asarray(rng.standard_normal((dim, dim)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((k, dim)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((k, dim)), jnp.float32)
    want = symmetric_rank_k_update_ref(P, X, Y)
    got = symmetric_rank_k_update(P, X, Y, block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("dim,m2,block", [(256, 16, 128), (515, 64, 128)])
def test_pht_s_matches_ref(rng, dim, m2, block):
    P = jnp.asarray(rng.standard_normal((dim, dim)), jnp.float32)
    Hd = jnp.asarray(rng.standard_normal((m2, dim)) * 0.1, jnp.float32)
    want_pht, want_s = pht_and_s_ref(P, Hd)
    got_pht, got_s = pht_and_s(P, Hd, block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pht), np.asarray(want_pht),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("R,C,k", [(128, 256, 16), (200, 515, 67)])
def test_rank_k_rect_matches_ref(rng, R, C, k):
    from tpuslam.kernels.sym_rank_k import (
        rank_k_update_rect,
        rank_k_update_rect_ref,
    )

    P = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
    Xr = jnp.asarray(rng.standard_normal((k, R)), jnp.float32)
    Yr = jnp.asarray(rng.standard_normal((k, R)), jnp.float32)
    Xc = jnp.asarray(rng.standard_normal((k, C)), jnp.float32)
    Yc = jnp.asarray(rng.standard_normal((k, C)), jnp.float32)
    want = rank_k_update_rect_ref(P, Xr, Yr, Xc, Yc)
    got = rank_k_update_rect(P, Xr, Yr, Xc, Yc, block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
