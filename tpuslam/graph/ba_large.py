"""Large-scale bundle adjustment: landmark-major grid layout, scatter-free.

`graph/ba.py` is the specification path: a general masked factor list whose
Schur elimination materializes a dense (M, 2, 3K) coupling tensor via
scatter-adds — exact, but TPU scatters are serial and the coupling tensor
is O(M*K).  This module is the scale path (BASELINE.json config 5: 1M
landmarks): the SAME Gauss-Newton / landmark-Schur math (see graph/ba.py
for the derivation; observation model = src/common.jl:139-165) laid out
TPU-first:

  * observation factors live on a dense (M, O) grid — landmark-major, up
    to O observing poses per landmark, masked.  Per-landmark reductions
    (Hll, bl, the Schur coupling) become dense sums over the O axis — no
    scatter anywhere.
  * pose-side reductions go through one-hot matmuls on the MXU
    (E[f, p] = 1 iff factor f observes pose p), never gather/scatter.
  * the Schur complement is accumulated in whitened form
        S_c = sum_m G_m' Hll_m^-1 G_m = sum_m V_m' V_m,
        V_m = L_m^-1 G_m,  Hll_m = L_m L_m'   (closed-form 2x2 Cholesky)
    so one (2M, 3K)-by-(2M, 3K) syrk — a single big MXU contraction —
    replaces the scatter/gather dance.
  * the landmark axis is processed in static-size chunks under lax.scan:
    peak memory is O(chunk * K) for the one-hot + V panels, O(M) for the
    stored per-landmark small blocks (Hll, bl, BtA), never O(M * K).

Memory at M = 1e6, O = 4, K = 64 (f32): grids ~48 MB, stored small blocks
~120 MB, per-chunk panels ~50 MB.  FLOPs/GN-iter ~ 0.2 TFLOP — a few ms on
one chip.

The distributed variant shards the M axis (`shard_map` over the 'map' mesh
axis); each shard whitens and reduces ITS landmarks, ONE psum assembles the
reduced (3K, 3K) pose system, the solve is replicated, back-substitution is
local — the identical collective pattern as parallel/ekf_sharded.py and
graph/ba_sharded.py.

Equivalence with graph/ba.py is asserted in tests/test_ba_large.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from tpuslam.core.geometry import mpi_to_pi
from tpuslam.graph.ba import _pose_only_terms
from tpuslam.graph.factors import obs_terms_flat
from tpuslam.kernels.dispatch import big_matmul_precision

_HI = lax.Precision.HIGHEST


class BAGridProblem(NamedTuple):
    """Landmark-major masked BA problem.

    K poses, M landmarks, up to O observing poses per landmark, Fo odometry
    factors.  Odometry/prior fields are named exactly as BAProblem so the
    pose-only assembly (graph/ba.py:_pose_only_terms) applies unchanged.
    """

    poses: jnp.ndarray        # (K, 3)
    landmarks: jnp.ndarray    # (M, 2)
    lm_mask: jnp.ndarray      # (M,) bool

    obs_p: jnp.ndarray        # (M, O) int32 observing-pose index (global)
    obs_z: jnp.ndarray        # (M, O, 2) range-bearing measurements
    obs_mask: jnp.ndarray     # (M, O) bool

    odo_i: jnp.ndarray        # (Fo,) int32
    odo_j: jnp.ndarray        # (Fo,) int32
    odo_meas: jnp.ndarray     # (Fo, 3)
    odo_mask: jnp.ndarray     # (Fo,) bool
    odo_sqrt_info: jnp.ndarray   # (3, 3)
    obs_sqrt_info: jnp.ndarray   # (2, 2)
    prior_sqrt_info: jnp.ndarray  # (3, 3)


def _chol2(Hll):
    """Closed-form Cholesky of a batch of SPD 2x2 blocks [[a,b],[b,d]]."""
    a = Hll[..., 0, 0]
    b = Hll[..., 1, 0]
    d = Hll[..., 1, 1]
    l11 = jnp.sqrt(a)
    l21 = b / l11
    l22 = jnp.sqrt(jnp.maximum(d - l21 * l21, 1e-20))
    return l11, l21, l22


def _chol2_solve(l11, l21, l22, r):
    """L y = r for stacked rhs r (..., 2, D) with L lower-triangular 2x2."""
    y1 = r[..., 0, :] / l11[..., None]
    y2 = (r[..., 1, :] - l21[..., None] * y1) / l22[..., None]
    return jnp.stack([y1, y2], axis=-2)


def _solve2(Hll, r):
    """Hll^-1 r for stacked 2x2 SPD blocks and rhs (..., 2)."""
    a = Hll[..., 0, 0]
    b = Hll[..., 0, 1]
    c = Hll[..., 1, 0]
    d = Hll[..., 1, 1]
    det = jnp.maximum(a * d - b * c, 1e-20)
    y0 = (d * r[..., 0] - b * r[..., 1]) / det
    y1 = (-c * r[..., 0] + a * r[..., 1]) / det
    return jnp.stack([y0, y1], axis=-1)


def _chunk_terms(poses, lm_c, obs_p_c, obs_z_c, obs_mask_c, W, damping, K,
                 huber=None):
    """Per-landmark-chunk factor evaluation: residuals, small blocks, and
    the chunk's whitened contributions to the reduced pose system.

    Returns (stored blocks for back-substitution, accumulator increments).
    Everything is dense over the (chunk, O) grid; pose-side placement goes
    through the one-hot E on the MXU.
    """
    mc, O = obs_p_c.shape
    dtype = poses.dtype
    F = mc * O

    # One-hot factor->pose placement (exact 0/1; MXU-streamed) — also used
    # to read the observing poses without a dynamic gather.
    E = (obs_p_c.reshape(F)[:, None]
         == jnp.arange(K, dtype=obs_p_c.dtype)[None, :]).astype(dtype)

    pf = jnp.matmul(E, poses, precision=_HI)  # (F, 3)
    lf = jnp.repeat(lm_c, O, axis=0)
    zf = obs_z_c.reshape(F, 2)

    # Scalar-unrolled factor algebra on flat (F,) vectors: batched einsums
    # over millions of 2x2/2x3 blocks lower to padded tiny dot_generals on
    # TPU (~100x off roofline, measured); unrolled components stay on the
    # VPU.  Same math as graph/ba.py's _obs_terms.
    m = obs_mask_c.reshape(F).astype(dtype)
    r0, r1, Ar_, Br_ = obs_terms_flat(
        pf[:, 0], pf[:, 1], pf[:, 2], lf[:, 0], lf[:, 1], zf[:, 0], zf[:, 1]
    )
    w = [[W[i, j] for j in range(2)] for i in range(2)]
    r = [m * (w[i][0] * r0 + w[i][1] * r1) for i in range(2)]
    A = [[m * (w[i][0] * Ar_[0][a] + w[i][1] * Ar_[1][a]) for a in range(3)]
         for i in range(2)]
    B = [[m * (w[i][0] * Br_[0][k] + w[i][1] * Br_[1][k]) for k in range(2)]
         for i in range(2)]
    if huber is not None:
        # IRLS Huber reweighting in whitened units (same kernel as
        # graph/ba.py:_obs_terms — bounds the influence of wrong
        # cross-submap matches, the pipeline's outlier channel).
        rn = jnp.sqrt(jnp.maximum(r[0] * r[0] + r[1] * r[1], 1e-20))
        sw = jnp.sqrt(jnp.minimum(1.0, huber / rn))
        r = [sw * x for x in r]
        A = [[sw * a for a in row] for row in A]
        B = [[sw * b for b in row] for row in B]

    def redO(x):                              # (F,) -> per-landmark sum
        return x.reshape(mc, O).sum(1)

    # Landmark-side small blocks: reduce the O axis densely.
    Hll = jnp.stack([
        jnp.stack([redO(B[0][k] * B[0][l] + B[1][k] * B[1][l])
                   for l in range(2)], -1)
        for k in range(2)], -2) + damping * jnp.eye(2, dtype=dtype)
    bl = jnp.stack([redO(B[0][k] * r[0] + B[1][k] * r[1])
                    for k in range(2)], -1)
    BtA = jnp.stack([
        jnp.stack([B[0][k] * A[0][a] + B[1][k] * A[1][a]
                   for a in range(3)], -1)
        for k in range(2)], -2)                              # (F, 2, 3)

    # Pose-side diagonal blocks + gradient: every per-factor product as a
    # (F, 12) panel, placed by pose through ONE E^T matmul on the MXU.
    cols = [A[0][k] * A[0][l] + A[1][k] * A[1][l]
            for k in range(3) for l in range(3)]
    cols += [A[0][k] * r[0] + A[1][k] * r[1] for k in range(3)]
    T = jnp.stack(cols, axis=-1)                             # (F, 12)
    ET = jnp.matmul(E.T, T, precision=_HI)                   # (K, 12)
    D = ET[:, :9].reshape(K, 3, 3)
    bp = ET[:, 9:]

    # Coupling panel G_m (2, 3K) spread by observer pose, then whitened:
    #   G[m, :, p, :] = sum_{o: p(m,o)=p} BtA[m, o]
    # Built as O broadcast multiply-adds of (mc, K) x (mc, 6) outer slabs —
    # the einsum form lowers to mc-batched 4x6 dot_generals (tiny, padded).
    Em = E.reshape(mc, O, K)
    Bm = BtA.reshape(mc, O, 6)
    G = jnp.zeros((mc, K, 6), dtype)
    for o in range(O):
        G = G + Em[:, o, :, None] * Bm[:, o, None, :]
    G = G.reshape(mc, K, 2, 3).transpose(0, 2, 1, 3).reshape(mc, 2, 3 * K)
    l11, l21, l22 = _chol2(Hll)
    V = _chol2_solve(l11, l21, l22, G).reshape(2 * mc, 3 * K)
    u = _chol2_solve(l11, l21, l22, bl[..., None])[..., 0]  # (mc, 2)

    prec = big_matmul_precision()
    Sc = jnp.matmul(V.T, V, precision=prec)                 # (3K, 3K) syrk
    bc = jnp.einsum("mkd,mk->d", V.reshape(mc, 2, 3 * K), u, precision=_HI)
    return (Hll, bl, BtA.reshape(mc, O, 2, 3)), (Sc, D, bp, bc)


def _grid_pass1(poses, prob: BAGridProblem, damping, chunk, huber=None):
    """Chunked scan over the landmark axis: per-landmark stored blocks +
    accumulated reduced-system contributions."""
    M, O = prob.obs_p.shape
    K = poses.shape[0]
    dtype = poses.dtype
    n_chunks = M // chunk

    def body(acc, xs):
        lm_c, op_c, oz_c, om_c = xs
        stored, inc = _chunk_terms(
            poses, lm_c, op_c, oz_c, om_c, prob.obs_sqrt_info, damping, K,
            huber,
        )
        # Kahan-compensated accumulation: the reduced-system entries grow to
        # ~(factor count x whitened weight^2) while the gauge mode is held
        # only by the prior, so plain f32 summation noise visibly rotates
        # the solution about the anchor (see tests/test_ba_large.py).
        sums, comps = acc
        new_sums, new_comps = [], []
        for s, c, x in zip(sums, comps, inc):
            y = x - c
            t = s + y
            new_comps.append((t - s) - y)
            new_sums.append(t)
        return (tuple(new_sums), tuple(new_comps)), stored

    def r(a):
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    zeros = (
        jnp.zeros((3 * K, 3 * K), dtype),
        jnp.zeros((K, 3, 3), dtype),
        jnp.zeros((K, 3), dtype),
        jnp.zeros(3 * K, dtype),
    )
    (acc, _), stored = lax.scan(
        body, (zeros, zeros),
        (r(prob.landmarks), r(prob.obs_p), r(prob.obs_z), r(prob.obs_mask)),
    )
    Hll = stored[0].reshape(M, 2, 2)
    bl = stored[1].reshape(M, 2)
    BtA = stored[2].reshape(M, O, 2, 3)
    return acc, (Hll, bl, BtA)


def _back_substitute(dp, stored, prob: BAGridProblem):
    """dl = Hll^-1 (-bl - G dp), with G dp rebuilt from the stored BtA and
    a tiny-table gather of dp by observer pose (no G materialization).
    The (M, O, 2, 3) x (M, O, 3) contraction is written as broadcast
    multiply + small-axis reduction — a batched tiny dot_general is ~100x
    off roofline on TPU (same lesson as _chunk_terms)."""
    Hll, bl, BtA = stored
    M, O = prob.obs_p.shape
    dp3 = dp.reshape(-1, 3)
    dpg = dp3[prob.obs_p.reshape(-1)].reshape(M, O, 3)
    Gdp = (BtA * dpg[:, :, None, :]).sum(axis=(1, 3))
    dl = _solve2(Hll, -bl - Gdp)
    return dl * prob.lm_mask[:, None].astype(dl.dtype)


def _gn_step_grid(prob: BAGridProblem, damping, chunk, psum_axis=None,
                  huber=None):
    """One damped GN step on the grid problem.  With `psum_axis`, the
    landmark-side accumulators are psum-reduced (sharded variant)."""
    K = prob.poses.shape[0]
    dtype = prob.poses.dtype
    (Sc, D, bp_obs, bc), stored = _grid_pass1(
        prob.poses, prob, damping, chunk, huber
    )
    if psum_axis is not None:
        Sc, D, bp_obs, bc = lax.psum((Sc, D, bp_obs, bc), psum_axis)

    Hpp_o, bp_o = _pose_only_terms(prob.poses, prob)
    eyeK = jnp.eye(K, dtype=dtype)
    Hpp_obs = jnp.einsum("pq,pkl->pkql", eyeK, D).reshape(3 * K, 3 * K)
    H = (Hpp_o + Hpp_obs - Sc
         + damping * jnp.eye(3 * K, dtype=dtype))
    b = bp_o + bp_obs.reshape(3 * K) - bc
    # Jacobi-preconditioned solve: position (m) and heading (rad) rows
    # differ by orders of magnitude; equilibrate before factorizing.
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(H), 1e-20))
    Hs = H * d[:, None] * d[None, :]
    dp = d * jnp.linalg.solve(Hs, -(b * d))

    dl = _back_substitute(dp, stored, prob)
    poses = prob.poses + dp.reshape(K, 3)
    poses = poses.at[:, 2].set(mpi_to_pi(poses[:, 2]))
    lm = prob.landmarks + dl
    return prob._replace(poses=poses, landmarks=lm)


def _fit_chunk(M: int, chunk: int) -> int:
    """Largest power-of-two-ish chunk <= `chunk` that divides M.

    Warns when the fitted chunk collapses far below the request (odd/prime
    M forces c toward 1, turning the landmark scan into up to M sequential
    steps) — pad M instead (masked slots are exact no-ops; see
    make_grid_ba_problem's `pad_to`)."""
    c = min(chunk, M)
    while M % c:
        c //= 2
    c = max(c, 1)
    if c < min(chunk, M) // 8:
        import warnings

        warnings.warn(
            f"ba_large: requested chunk {chunk} collapsed to {c} because it "
            f"must divide M={M}; the landmark scan now runs {M // c} "
            f"sequential steps.  Pad M to a chunk multiple "
            f"(make_grid_ba_problem(pad_to=...)) — masked slots are no-ops.",
            stacklevel=3,
        )
    return c


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def gauss_newton_grid(prob: BAGridProblem, iters: int = 10,
                      damping: float = 1e-6, chunk: int = 4096,
                      with_cost: bool = True, huber=None):
    """Damped GN on the grid layout; returns (problem, final masked cost).

    Pad M (masked slots are exact no-ops) so a large chunk divides it —
    otherwise the chunk shrinks to the next divisor.  `with_cost=False`
    skips the final cost evaluation (an extra full factor pass) — used by
    the benchmark harness to time pure GN iterations."""
    c = _fit_chunk(prob.landmarks.shape[0], chunk)

    def body(p, _):
        return _gn_step_grid(p, damping, c, huber=huber), ()

    prob, _ = lax.scan(body, prob, None, length=iters)
    return prob, (grid_cost(prob) if with_cost
                  else jnp.zeros((), prob.poses.dtype))


def grid_cost(prob: BAGridProblem):
    from tpuslam.graph.ba import _odo_terms

    M, O = prob.obs_p.shape
    W = prob.obs_sqrt_info
    pf = prob.poses[prob.obs_p.reshape(-1)]
    lf = jnp.repeat(prob.landmarks, O, axis=0)
    zf = prob.obs_z.reshape(-1, 2)
    r0, r1, _, _ = obs_terms_flat(
        pf[:, 0], pf[:, 1], pf[:, 2], lf[:, 0], lf[:, 1], zf[:, 0], zf[:, 1]
    )
    m = (prob.obs_mask.reshape(-1)
         & prob.lm_mask.repeat(O)).astype(r0.dtype)
    w0 = (W[0, 0] * r0 + W[0, 1] * r1) * m
    w1 = (W[1, 0] * r0 + W[1, 1] * r1) * m
    r_o, _, _ = _odo_terms(prob.poses, prob)
    return jnp.sum(r_o**2) + jnp.sum(w0 * w0 + w1 * w1)


# ---------------------------------------------------------------------------
# Sharded variant: landmark axis over the 'map' mesh; ONE psum per GN step.
# ---------------------------------------------------------------------------

AXIS = "map"


def grid_problem_specs(axis: str = AXIS) -> BAGridProblem:
    return BAGridProblem(
        poses=P(), landmarks=P(axis), lm_mask=P(axis),
        obs_p=P(axis), obs_z=P(axis), obs_mask=P(axis),
        odo_i=P(), odo_j=P(), odo_meas=P(), odo_mask=P(),
        odo_sqrt_info=P(), obs_sqrt_info=P(), prior_sqrt_info=P(),
    )


def make_sharded_gauss_newton_grid(mesh, iters: int, damping: float = 1e-6,
                                   chunk: int = 4096, axis: str = AXIS,
                                   huber=None):
    """Sharded GN: per shard chunked landmark elimination, one psum for the
    reduced pose system, replicated solve, local back-substitution.
    Pose indices stay global (the one-hot E spans all K poses), so no
    index localization is needed — only the M-axis arrays are split."""
    sp = grid_problem_specs(axis)

    def run(prob):
        c = _fit_chunk(prob.landmarks.shape[0], chunk)

        def body(p, _):
            return _gn_step_grid(p, damping, c, psum_axis=axis,
                                 huber=huber), ()

        prob, _ = lax.scan(body, prob, None, length=iters)
        return prob

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh, in_specs=(sp,), out_specs=sp, check_vma=False
        )
    )


# ---------------------------------------------------------------------------
# Problem generators / converters (host-side, NumPy)
# ---------------------------------------------------------------------------

def make_grid_ba_problem(n_landmarks: int, n_poses: int, n_obs: int = 4,
                         extent: float = 1000.0, seed: int = 0,
                         pose_noise: float = 0.05, z_noise=(0.1, 0.0175),
                         init_noise: float = 0.5,
                         pad_to: int | None = None, dtype=np.float32):
    """Synthetic large-scale BA instance: poses on a loop through an
    extent x extent scene, landmarks uniform, each landmark observed
    (range-bearing) from its `n_obs` nearest poses.  Odometry chains the
    poses; the initial guess perturbs everything."""
    rng = np.random.default_rng(seed)
    K, M, O = n_poses, n_landmarks, n_obs

    t = np.linspace(0.0, 2 * np.pi, K, endpoint=False)
    cx = extent / 2
    rad = extent * 0.35
    px = cx + rad * np.cos(t)
    py = cx + rad * np.sin(t)
    heading = t + np.pi / 2
    poses_true = np.stack([px, py, heading], axis=1)

    lm_true = rng.uniform(extent * 0.05, extent * 0.95, size=(M, 2))

    # O nearest poses per landmark (chunked to bound the distance matrix).
    obs_p = np.empty((M, O), np.int32)
    for s in range(0, M, 262144):
        e = min(M, s + 262144)
        d2 = ((lm_true[s:e, None, :]
               - poses_true[None, :, :2]) ** 2).sum(-1)
        obs_p[s:e] = np.argpartition(d2, O - 1, axis=1)[:, :O]

    pp = poses_true[obs_p.reshape(-1)]
    dxy = np.repeat(lm_true, O, axis=0) - pp[:, :2]
    rng_d = np.linalg.norm(dxy, axis=1)
    brg = np.arctan2(dxy[:, 1], dxy[:, 0]) - pp[:, 2]
    z = np.stack([rng_d + rng.normal(0, z_noise[0], M * O),
                  brg + rng.normal(0, z_noise[1], M * O)], axis=1)
    z[:, 1] = (z[:, 1] + np.pi) % (2 * np.pi) - np.pi

    # Odometry chain i -> i+1 (exact relative pose + noise).
    oi = np.arange(K - 1, dtype=np.int32)
    oj = oi + 1
    dp = poses_true[oj] - poses_true[oi]
    c, s_ = np.cos(poses_true[oi, 2]), np.sin(poses_true[oi, 2])
    odo = np.stack([c * dp[:, 0] + s_ * dp[:, 1],
                    -s_ * dp[:, 0] + c * dp[:, 1],
                    (dp[:, 2] + np.pi) % (2 * np.pi) - np.pi], axis=1)
    odo += rng.normal(0, pose_noise, odo.shape)

    M_pad = pad_to if pad_to else M
    assert M_pad >= M

    def padM(a):
        out = np.zeros((M_pad,) + a.shape[1:], a.dtype)
        out[:M] = a
        return out

    poses0 = poses_true + rng.normal(0, init_noise, poses_true.shape) \
        * np.array([1.0, 1.0, 0.02])
    poses0[0] = poses_true[0]                      # gauge anchor
    lm0 = lm_true + rng.normal(0, init_noise, lm_true.shape)

    # Gauge prior scaled to the problem's total information: rigid
    # rotation/translation about the anchor is invisible to every relative
    # factor, so the prior must be as stiff as the data modes or f32
    # accumulation noise drifts the whole solution along the gauge.
    prior_w = max(1 / z_noise[0], 1 / z_noise[1]) * np.sqrt(M * O)

    return BAGridProblem(
        poses=jnp.asarray(poses0, dtype),
        landmarks=jnp.asarray(padM(lm0.astype(dtype)), dtype),
        lm_mask=jnp.asarray(padM(np.ones(M, bool))),
        obs_p=jnp.asarray(padM(obs_p)),
        obs_z=jnp.asarray(padM(z.reshape(M, O, 2).astype(dtype))),
        obs_mask=jnp.asarray(padM(np.ones((M, O), bool))),
        odo_i=jnp.asarray(oi), odo_j=jnp.asarray(oj),
        odo_meas=jnp.asarray(odo, dtype),
        odo_mask=jnp.asarray(np.ones(K - 1, bool)),
        odo_sqrt_info=jnp.asarray(
            np.diag([1 / pose_noise] * 3).astype(dtype)),
        obs_sqrt_info=jnp.asarray(
            np.diag([1 / z_noise[0], 1 / z_noise[1]]).astype(dtype)),
        prior_sqrt_info=jnp.asarray((np.eye(3) * prior_w).astype(dtype)),
    ), jnp.asarray(poses_true, dtype), jnp.asarray(lm_true, dtype)


def grid_to_factor_problem(prob: BAGridProblem):
    """Flatten a grid problem into graph/ba.py's BAProblem (for the
    equivalence tests — both encode identical factor sets)."""
    from tpuslam.graph.ba import BAProblem

    M, O = prob.obs_p.shape
    return BAProblem(
        poses=prob.poses,
        landmarks=prob.landmarks,
        lm_mask=prob.lm_mask,
        odo_i=prob.odo_i, odo_j=prob.odo_j, odo_meas=prob.odo_meas,
        odo_mask=prob.odo_mask, odo_sqrt_info=prob.odo_sqrt_info,
        obs_p=prob.obs_p.reshape(-1),
        obs_l=jnp.repeat(jnp.arange(M, dtype=prob.obs_p.dtype), O),
        obs_z=prob.obs_z.reshape(-1, 2),
        obs_mask=prob.obs_mask.reshape(-1),
        obs_sqrt_info=prob.obs_sqrt_info,
        prior_sqrt_info=prob.prior_sqrt_info,
    )
