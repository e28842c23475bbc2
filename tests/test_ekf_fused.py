"""Fused-epoch panel algebra == modular predict/update/augment (float64)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.filters.ekf import (
    add_features,
    predict,
    predict_accumulate,
    predict_accumulator_init,
    update,
)
from tpuslam.filters.ekf_fused import fused_epoch_apply, predicted_assoc_blocks
from tests.test_ekf import random_filter_state, to_fixed

Q = np.diag([0.25, 0.003])
R = np.diag([0.01, 0.0003])
WB, DT = 4.0, 0.025


def modular_epoch(st, controls, z, matched, new, idf):
    for v, g in controls:
        st = predict(st, v, g, WB, jnp.asarray(Q), DT)
    st = update(st, jnp.asarray(z), jnp.asarray(matched),
                jnp.asarray(idf), jnp.asarray(R))
    st = add_features(st, jnp.asarray(z), jnp.asarray(new), jnp.asarray(R))
    return st


def fused_epoch(st, controls, z, matched, new, idf):
    acc = predict_accumulator_init(st.x[:3])
    for v, g in controls:
        acc = predict_accumulate(acc, v, g, WB, jnp.asarray(Q), DT)
    pose_pred, Gt, Qacc = acc
    return fused_epoch_apply(
        st, pose_pred, Gt, Qacc, jnp.asarray(z), jnp.asarray(matched),
        jnp.asarray(new), jnp.asarray(idf), jnp.asarray(R), True
    )


@pytest.mark.parametrize("n_feat,n_match,n_new", [(4, 2, 1), (8, 5, 3),
                                                  (0, 0, 4), (6, 3, 0)])
def test_fused_equals_modular(rng, n_feat, n_match, n_new):
    from tpuslam.sim import oracle

    x_o, P_o = random_filter_state(rng, n_feat)
    st = to_fixed(x_o, P_o, cap=16)
    controls = [(8.0 + rng.normal() * 0.3, 0.1 + rng.normal() * 0.02)
                for _ in range(9)]

    max_nz = 8
    z = np.zeros((max_nz, 2))
    matched = np.zeros(max_nz, bool)
    new = np.zeros(max_nz, bool)
    idf = np.zeros(max_nz, np.int32)
    # Matched obs near features of a ROUGHLY predicted state (prediction
    # moves the pose slightly; gates don't matter here, masks are given).
    if n_match:
        ids = rng.choice(n_feat, n_match, replace=False)
        for k, j in enumerate(ids):
            zp, _ = oracle.predict_observation(x_o, j)
            z[k] = zp + rng.standard_normal(2) * [0.1, 0.01]
            matched[k] = True
            idf[k] = j
    for k in range(n_match, n_match + n_new):
        z[k] = [rng.uniform(2, 20), rng.uniform(-np.pi, np.pi)]
        new[k] = True

    want = modular_epoch(st, controls, z, matched, new, idf)
    got = fused_epoch(st, controls, z, matched, new, idf)

    assert int(got.n) == int(want.n)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(want.P),
                               rtol=1e-8, atol=1e-10)


def test_fused_inactive_applies_predict_only(rng):
    x_o, P_o = random_filter_state(rng, 3)
    st = to_fixed(x_o, P_o, cap=16)
    controls = [(8.0, 0.1)] * 9
    z = rng.uniform(1, 20, (4, 2))
    matched = np.array([True, False, False, False])
    new = np.array([False, True, False, False])

    # upd_active=False: only the accumulated predict may apply.
    acc = predict_accumulator_init(st.x[:3])
    for v, g in controls:
        acc = predict_accumulate(acc, v, g, WB, jnp.asarray(Q), DT)
    got = fused_epoch_apply(
        st, acc[0], acc[1], acc[2], jnp.asarray(z), jnp.asarray(matched),
        jnp.asarray(new), jnp.zeros(4, jnp.int32), jnp.asarray(R), False
    )
    want = st
    for v, g in controls:
        want = predict(want, v, g, WB, jnp.asarray(Q), DT)
    assert int(got.n) == 3
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(want.P),
                               rtol=1e-9, atol=1e-10)


def test_predicted_assoc_blocks_match_full_predict(rng):
    x_o, P_o = random_filter_state(rng, 5)
    st = to_fixed(x_o, P_o, cap=8)
    acc = predict_accumulator_init(st.x[:3])
    for v, g in [(8.0, 0.1), (7.7, 0.12), (8.2, 0.09)]:
        acc = predict_accumulate(acc, v, g, WB, jnp.asarray(Q), DT)
        st_ref = predict(st if v == 8.0 else st_ref, v, g, WB,
                         jnp.asarray(Q), DT)
    P33p, P3fp, Pff = predicted_assoc_blocks(st, acc[1], acc[2])
    Pref = np.asarray(st_ref.P)
    np.testing.assert_allclose(np.asarray(P33p), Pref[:3, :3], rtol=1e-10)
    for j in range(5):
        cjs = 3 + 2 * j
        np.testing.assert_allclose(
            np.asarray(P3fp)[j], Pref[:3, cjs:cjs + 2], rtol=1e-9,
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(Pff)[j], Pref[cjs:cjs + 2, cjs:cjs + 2], atol=1e-12
        )
