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


def test_dot_general_3pass_accuracy(rng):
    """The explicit 3-pass bf16 emulation (Mosaic can't lower
    precision=HIGH) matches the f64 product to ~2^-16 relative — the same
    error structure as XLA's Precision.HIGH."""
    from tpuslam.kernels.mm import dot_general_3pass

    a = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 48)), jnp.float32)
    got = np.asarray(dot_general_3pass(a, b, (((1,), (0,)), ((), ()))))
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2.0 ** -14
    # And clearly better than a single bf16 pass.
    one_pass = np.asarray(
        (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16)).astype(jnp.float32)
    )
    assert rel < 0.01 * np.abs(one_pass - want).max() / np.abs(want).max()


def test_kernels_high_precision_mode(rng, monkeypatch):
    """Kernels compile and stay accurate with the 3-pass HIGH policy
    (interpret mode exercises the in-kernel emulation path)."""
    from tpuslam.kernels import dispatch
    from tpuslam.kernels.sym_rank_k import rank_k_update_rect

    monkeypatch.setenv("TPUSLAM_BIG_MATMUL_PRECISION", "high")
    dispatch._precision_mode.cache_clear()
    try:
        R, C, k = (128, 256, 16)
        P = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
        Xr = jnp.asarray(rng.standard_normal((k, R)), jnp.float32)
        Yr = jnp.asarray(rng.standard_normal((k, R)), jnp.float32)
        Xc = jnp.asarray(rng.standard_normal((k, C)), jnp.float32)
        Yc = jnp.asarray(rng.standard_normal((k, C)), jnp.float32)
        got = np.asarray(
            rank_k_update_rect(P, Xr, Yr, Xc, Yc, interpret=True)
        )
        want = (np.asarray(P, np.float64)
                + np.asarray(Xr, np.float64).T @ np.asarray(Yc, np.float64)
                + np.asarray(Yr, np.float64).T @ np.asarray(Xc, np.float64))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 2.0 ** -13
    finally:
        dispatch._precision_mode.cache_clear()


def test_auto_precision_thresholds():
    from jax import lax

    from tpuslam.kernels.dispatch import (
        AUTO_HIGH_MIN_DIM,
        big_matmul_precision,
    )

    assert big_matmul_precision(AUTO_HIGH_MIN_DIM - 1) == (
        lax.Precision.HIGHEST
    )
    assert big_matmul_precision(AUTO_HIGH_MIN_DIM) == lax.Precision.HIGH
    assert big_matmul_precision(None) == lax.Precision.HIGHEST


def test_rank_k_rect_ref_fp16_chunked_exact(rng):
    """fp16-stored P takes the XLA path at every size (Mosaic cannot
    lower f16); at rows >= 4096 that path walks P in row blocks through
    an aliased fori carry so the f32 delta never materializes at full
    size (the difference between cap 20480 and cap 32768 fitting in
    16 GB HBM).  The chunked walk must be BITWISE identical to the
    unchunked form — same per-row algebra, same rounding point."""
    from tpuslam.kernels.sym_rank_k import rank_k_update_rect_ref

    # rows must make the block picker choose blk < rows or the plain
    # unchunked branch runs and this test verifies nothing (advisor r3):
    # at 4096 the first divisor tried IS 4096, failing the blk < rows
    # guard.  6144 -> blk 3072, two chunk iterations.
    rows = cols = 6144
    blk = next(b for b in (4096, 3072, 2048, 1536, 1024, 512, 256)
               if rows % b == 0)
    assert blk < rows, "picked a size where the chunked branch is dead"
    k = 8
    P = jnp.asarray(0.01 * rng.standard_normal((rows, cols)), jnp.float16)
    Xr = jnp.asarray(0.01 * rng.standard_normal((k, rows)), jnp.float32)
    Yr = jnp.asarray(0.01 * rng.standard_normal((k, rows)), jnp.float32)
    Xc = jnp.asarray(0.01 * rng.standard_normal((k, cols)), jnp.float32)
    Yc = jnp.asarray(0.01 * rng.standard_normal((k, cols)), jnp.float32)
    got = np.asarray(rank_k_update_rect_ref(P, Xr, Yr, Xc, Yc))
    acc = (np.asarray(Xr, np.float64).T.astype(np.float32)
           @ np.asarray(Yc)
           + np.asarray(Yr).T @ np.asarray(Xc))
    want = (np.asarray(P, np.float32) + acc).astype(np.float16)
    assert got.dtype == np.float16
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32),
                               rtol=1e-3, atol=1e-4)


def test_fp16_storage_never_dispatches_pallas():
    """Mosaic has no f16 — the dispatcher must route fp16-stored blocks
    to XLA even above the Pallas size threshold (measured failure:
    'Unsupported type in mosaic dialect: f16' at cap 24576)."""
    from tpuslam.kernels.dispatch import use_pallas_for

    assert use_pallas_for(65536, "rank_k", dtype=jnp.float16) is False
