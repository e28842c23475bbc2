"""ctypes bindings for the native (C++) host-side components, with a pure
NumPy fallback when the shared library is unavailable.

The native library lives in native/ at the repo root (built with `make -C
native`); this wrapper builds it on demand the first time it is imported in
an environment with a toolchain, and otherwise falls back transparently —
every API here has identical NumPy semantics (asserted in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libtpuslam_native.so")


def _load():
    srcs = [os.path.join(_NATIVE_DIR, f)
            for f in ("spatial_index.cc", "constellation.cc")]
    stale = os.path.exists(_SO_PATH) and any(
        os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(_SO_PATH)
        for s in srcs)
    if not os.path.exists(_SO_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.tpuslam_grid_build.restype = ctypes.c_void_p
    lib.tpuslam_grid_build.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double
    ]
    lib.tpuslam_grid_free.argtypes = [ctypes.c_void_p]
    lib.tpuslam_grid_visible.restype = ctypes.c_int64
    lib.tpuslam_grid_visible.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.tpuslam_grid_match.restype = None
    lib.tpuslam_grid_match.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tpuslam_grid_match_excl.restype = None
    lib.tpuslam_grid_match_excl.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tpuslam_grid_offset_vote.restype = ctypes.c_int64
    lib.tpuslam_grid_offset_vote.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]
    lib.tpuslam_union_find.restype = None
    lib.tpuslam_union_find.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tpuslam_ba_factors.restype = ctypes.c_int64
    lib.tpuslam_ba_factors.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.tpuslam_constel_new.restype = ctypes.c_void_p
    lib.tpuslam_constel_new.argtypes = [
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.tpuslam_constel_free.argtypes = [ctypes.c_void_p]
    lib.tpuslam_constel_entries.restype = ctypes.c_int64
    lib.tpuslam_constel_entries.argtypes = [ctypes.c_void_p]
    lib.tpuslam_constel_add.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.tpuslam_constel_query.restype = ctypes.c_int64
    lib.tpuslam_constel_query.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


_LIB = _load()


def native_available() -> bool:
    return _LIB is not None


def union_find_roots(nn) -> np.ndarray:
    """Root per node of the union-find over edges (i, nn[i]) for nn[i]>=0,
    smallest member index canonical.  C++ when available; pure-Python
    fallback with identical semantics (asserted in tests/test_native.py).
    Used by graph/submaps.py:merge_duplicates — the per-node Python loop
    was the host-side wall on the road to 1M-landmark global maps."""
    nn = np.ascontiguousarray(nn, dtype=np.int64).reshape(-1)
    n = len(nn)
    out = np.empty(n, dtype=np.int64)
    if _LIB is not None:
        _LIB.tpuslam_union_find(
            nn.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if 0 <= nn[i] < n:
            ri, rj = find(i), find(int(nn[i]))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    for i in range(n):
        out[i] = find(i)
    return out


class SpatialIndex:
    """Uniform-grid index over (N, 2) landmark positions.

    visible(pose, range) reproduces the reference sensor acceptance
    (front half-plane AND in range, sim/sim-utils.jl:12-28), returning
    ascending landmark indices.
    """

    def __init__(self, points, cell_size: float | None = None):
        self.points = np.ascontiguousarray(points, dtype=np.float64)
        assert self.points.ndim == 2 and self.points.shape[1] == 2
        self.cell_size = float(cell_size or 30.0)
        self._handle = None
        if _LIB is not None:
            self._handle = _LIB.tpuslam_grid_build(
                self.points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(self.points), self.cell_size,
            )

    def __del__(self):
        if getattr(self, "_handle", None) and _LIB is not None:
            _LIB.tpuslam_grid_free(self._handle)
            self._handle = None

    def visible(self, pose, sensor_range: float) -> np.ndarray:
        px, py, phi = float(pose[0]), float(pose[1]), float(pose[2])
        if self._handle is not None:
            cap = len(self.points)
            out = np.empty(cap, dtype=np.int64)
            m = _LIB.tpuslam_grid_visible(
                self._handle, px, py, phi, float(sensor_range),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap,
            )
            return out[: min(m, cap)].copy()
        # NumPy fallback — identical semantics.
        dx = self.points[:, 0] - px
        dy = self.points[:, 1] - py
        vis = (dx * np.cos(phi) + dy * np.sin(phi) > 0) & (
            dx * dx + dy * dy < sensor_range**2
        )
        return np.nonzero(vis)[0].astype(np.int64)

    def match(self, queries, radius: float) -> np.ndarray:
        """Nearest indexed point within `radius` per query point.

        queries: (Q, 2).  Returns (Q,) int64 indices into the indexed
        points, -1 where nothing lies within the radius.  Lowest index
        wins exact distance ties.  Used for cross-submap landmark
        association (graph/submaps.py)."""
        q = np.ascontiguousarray(queries, dtype=np.float64).reshape(-1, 2)
        if self._handle is not None:
            out = np.empty(len(q), dtype=np.int64)
            _LIB.tpuslam_grid_match(
                self._handle,
                q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(q), float(radius),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return out
        # NumPy fallback — identical semantics (argmin keeps lowest index
        # on ties).
        if len(self.points) == 0:
            return np.full(len(q), -1, dtype=np.int64)
        d2 = ((q[:, None, :] - self.points[None, :, :]) ** 2).sum(-1)
        best = np.argmin(d2, axis=1)
        hit = d2[np.arange(len(q)), best] < radius * radius
        return np.where(hit, best, -1).astype(np.int64)

    def match_excluding(self, queries, radius: float,
                        exclude) -> np.ndarray:
        """match() with one excluded index per query (exclude[i] skipped
        for query i) — the self-match case when querying an index with
        its own points (duplicate-merge pass)."""
        q = np.ascontiguousarray(queries, dtype=np.float64).reshape(-1, 2)
        ex = np.ascontiguousarray(exclude, dtype=np.int64).reshape(-1)
        assert len(ex) == len(q)
        if self._handle is not None:
            out = np.empty(len(q), dtype=np.int64)
            _LIB.tpuslam_grid_match_excl(
                self._handle,
                q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(q), float(radius),
                ex.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return out
        if len(self.points) == 0:
            return np.full(len(q), -1, dtype=np.int64)
        d2 = ((q[:, None, :] - self.points[None, :, :]) ** 2).sum(-1)
        d2[np.arange(len(q)), np.clip(ex, 0, len(self.points) - 1)] = (
            np.where(ex >= 0, np.inf,
                     d2[np.arange(len(q)),
                        np.clip(ex, 0, len(self.points) - 1)])
        )
        best = np.argmin(d2, axis=1)
        hit = d2[np.arange(len(q)), best] < radius * radius
        return np.where(hit, best, -1).astype(np.int64)

    def offset_vote(self, queries, radius: float, bin_size: float = 1.0):
        """Translation-voting registration: the dominant offset from the
        query cloud to the indexed cloud among all pairs within `radius`
        (mode of pairwise differences, refined to a mean near the peak).
        Robust where nearest-neighbor matching fails (drift > point
        spacing).  Returns ((dx, dy), peak_vote_count)."""
        q = np.ascontiguousarray(queries, dtype=np.float64).reshape(-1, 2)
        if self._handle is not None:
            out = np.zeros(2, np.float64)
            cnt = _LIB.tpuslam_grid_offset_vote(
                self._handle,
                q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(q), float(radius), float(bin_size),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            return (float(out[0]), float(out[1])), int(cnt)
        # NumPy fallback — identical semantics.
        if len(self.points) == 0 or len(q) == 0:
            return (0.0, 0.0), 0
        d = self.points[None, :, :] - q[:, None, :]      # (Q, N, 2)
        ok = (d ** 2).sum(-1) < radius * radius
        dd = d[ok]
        if not len(dd):
            return (0.0, 0.0), 0
        nb = max(1, int(2 * radius / bin_size) + 1)
        bx = np.clip(((dd[:, 0] + radius) / bin_size).astype(int), 0,
                     nb - 1)
        by = np.clip(((dd[:, 1] + radius) / bin_size).astype(int), 0,
                     nb - 1)
        hist = np.zeros((nb, nb), np.int64)
        np.add.at(hist, (by, bx), 1)
        # 3x3 smoothed argmax (same as the C++ path).
        sm = np.zeros_like(hist)
        for y in range(nb):
            for x in range(nb):
                sm[y, x] = hist[max(0, y - 1):y + 2,
                                max(0, x - 1):x + 2].sum()
        by0, bx0 = np.unravel_index(np.argmax(sm), sm.shape)
        cx = (bx0 + 0.5) * bin_size - radius
        cy = (by0 + 0.5) * bin_size - radius
        near = (np.abs(dd[:, 0] - cx) <= 1.5 * bin_size) & (
            np.abs(dd[:, 1] - cy) <= 1.5 * bin_size)
        if not near.any():
            return (0.0, 0.0), 0
        return ((float(dd[near, 0].mean()), float(dd[near, 1].mean())),
                int(near.sum()))

    def ba_factors(self, poses, sensor_range: float, noise=None,
                   sigma_r: float = 0.0, sigma_b: float = 0.0,
                   cap: int | None = None):
        """Batch observation-factor generation for the BA keyframe builder.

        poses: (K, 3).  noise: optional (cap, 2) standard normals applied as
        [sigma_r, sigma_b]-scaled additive noise in factor-emission order.
        Returns (pose_idx (F,), lm_idx (F,), z (F, 2)).
        """
        poses = np.ascontiguousarray(poses, dtype=np.float64)
        K = len(poses)
        cap = int(cap if cap is not None else K * len(self.points))
        if self._handle is not None:
            out_p = np.empty(cap, np.int32)
            out_l = np.empty(cap, np.int32)
            out_z = np.empty((cap, 2), np.float64)
            nz = (np.ascontiguousarray(noise, np.float64)
                  if noise is not None else None)
            f = _LIB.tpuslam_ba_factors(
                self._handle,
                poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                K, float(sensor_range),
                (nz.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
                 if nz is not None else None),
                float(sigma_r), float(sigma_b),
                out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                cap,
            )
            return out_p[:f].copy(), out_l[:f].copy(), out_z[:f].copy()
        # NumPy fallback.
        ps, ls, zs = [], [], []
        f = 0
        for k in range(K):
            ids = self.visible(poses[k], sensor_range)
            for i in ids:
                if f >= cap:
                    break
                dx = self.points[i, 0] - poses[k, 0]
                dy = self.points[i, 1] - poses[k, 1]
                r = np.hypot(dx, dy)
                b = np.arctan2(dy, dx) - poses[k, 2]
                if noise is not None:
                    r += noise[f, 0] * sigma_r
                    b += noise[f, 1] * sigma_b
                ps.append(k)
                ls.append(i)
                zs.append([r, b])
                f += 1
        return (np.asarray(ps, np.int32), np.asarray(ls, np.int32),
                np.asarray(zs, np.float64).reshape(-1, 2))
