"""Native spatial index (C++) == NumPy fallback == reference sensor rule."""

import numpy as np
import pytest

from tpuslam.native import SpatialIndex, native_available


@pytest.fixture(scope="module")
def cloud(request):
    rng = np.random.default_rng(42)
    return rng.uniform(0, 200, (5000, 2))


def reference_visible(points, pose, rng_max):
    dx = points[:, 0] - pose[0]
    dy = points[:, 1] - pose[1]
    vis = (dx * np.cos(pose[2]) + dy * np.sin(pose[2]) > 0) & (
        dx**2 + dy**2 < rng_max**2
    )
    return np.nonzero(vis)[0]


def test_native_built():
    # The toolchain is baked into this image; the native path must be live.
    assert native_available()


@pytest.mark.parametrize("seed", range(5))
def test_visible_matches_bruteforce(cloud, seed):
    rng = np.random.default_rng(seed)
    idx = SpatialIndex(cloud, cell_size=30.0)
    pose = np.array([rng.uniform(0, 200), rng.uniform(0, 200),
                     rng.uniform(-np.pi, np.pi)])
    got = idx.visible(pose, 30.0)
    want = reference_visible(cloud, pose, 30.0)
    np.testing.assert_array_equal(got, want)


def test_visible_empty_and_all():
    pts = np.array([[10.0, 0.0], [20.0, 0.0], [-5.0, 0.0]])
    idx = SpatialIndex(pts, cell_size=10.0)
    # Heading +x from origin: sees the two front points in range 25.
    np.testing.assert_array_equal(
        idx.visible([0.0, 0.0, 0.0], 25.0), [0, 1]
    )
    # Heading -x: only the behind point.
    np.testing.assert_array_equal(
        idx.visible([0.0, 0.0, np.pi], 25.0), [2]
    )
    np.testing.assert_array_equal(idx.visible([500.0, 500.0, 0.0], 10.0), [])


def test_ba_factors_match_fallback(cloud):
    rng = np.random.default_rng(7)
    poses = np.stack([
        rng.uniform(50, 150, 6), rng.uniform(50, 150, 6),
        rng.uniform(-np.pi, np.pi, 6)
    ], axis=-1)
    idx = SpatialIndex(cloud[:800], cell_size=30.0)
    noise = rng.standard_normal((10000, 2))

    p1, l1, z1 = idx.ba_factors(poses, 30.0, noise, 0.1, 0.01)

    # Force the NumPy fallback on an identical index.
    idx2 = SpatialIndex(cloud[:800], cell_size=30.0)
    idx2._handle = None
    p2, l2, z2 = idx2.ba_factors(poses, 30.0, noise, 0.1, 0.01)

    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(z1, z2, rtol=1e-12)


def test_scales_to_large_maps():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 5000, (200_000, 2))
    idx = SpatialIndex(pts, cell_size=30.0)
    import time
    t0 = time.time()
    for k in range(100):
        idx.visible([2500.0 + k, 2500.0, 0.3], 30.0)
    dt = time.time() - t0
    # 100 queries over 200k points; grid makes this trivially fast.
    assert dt < 1.0


def test_union_find_matches_fallback():
    # C++ union-find == pure-Python fallback (min-root canonical), used by
    # graph/submaps.py:merge_duplicates on the way to 1M-landmark maps.
    import tpuslam.native as N
    from tpuslam.native import union_find_roots

    rng = np.random.default_rng(7)
    for _ in range(30):
        M = int(rng.integers(1, 400))
        nn = rng.integers(-1, M, size=M)
        got = union_find_roots(nn)
        lib, N._LIB = N._LIB, None
        try:
            want = union_find_roots(nn)
        finally:
            N._LIB = lib
        np.testing.assert_array_equal(got, want)
        # Roots are canonical (a root's root is itself) and minimal.
        np.testing.assert_array_equal(got[got], got)
        assert (got <= np.arange(M)).all()
