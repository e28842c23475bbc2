"""Batch bundle adjustment / pose-graph optimization with landmark Schur
elimination — Gauss-Newton over (poses, landmarks).

The landmark-landmark normal-equation block Hll is block-diagonal (2x2 per
landmark), so the landmark variables are eliminated in closed form and only
the reduced pose system (3K x 3K) is solved directly — the classic BA Schur
complement.  This is the same landmark-block decomposition the distributed
EKF uses (parallel/ekf_sharded.py); the sharded variant
(graph/ba_sharded.py) psums the per-shard Schur contributions.

All factor sets are fixed-capacity masked arrays; the whole GN loop is one
jitted lax.scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpuslam.core.geometry import mpi_to_pi
from tpuslam.graph.factors import obs_residual, odo_residual

_HI = lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Fixed-capacity masked BA problem.

    K poses, M landmarks, Fo odometry factors, Fz observation factors.
    """

    poses: jnp.ndarray       # (K, 3) initial pose estimates
    landmarks: jnp.ndarray   # (M, 2) initial landmark estimates
    lm_mask: jnp.ndarray     # (M,) bool — active landmarks

    odo_i: jnp.ndarray       # (Fo,) int32 from-pose index
    odo_j: jnp.ndarray       # (Fo,) int32 to-pose index
    odo_meas: jnp.ndarray    # (Fo, 3) measured relative pose (local frame)
    odo_mask: jnp.ndarray    # (Fo,) bool
    odo_sqrt_info: jnp.ndarray  # (3, 3) square-root information (shared)

    obs_p: jnp.ndarray       # (Fz,) int32 pose index
    obs_l: jnp.ndarray       # (Fz,) int32 landmark index
    obs_z: jnp.ndarray       # (Fz, 2) range-bearing measurements
    obs_mask: jnp.ndarray    # (Fz,) bool
    obs_sqrt_info: jnp.ndarray  # (2, 2) square-root information (shared)

    prior_sqrt_info: jnp.ndarray  # (3, 3) prior on pose 0 (anchors gauge)


def _obs_terms(poses, landmarks, prob, huber=None):
    """Whitened residuals + Jacobian blocks for every observation factor.

    With `huber` set (whitened-sigma units, typically 2-4), factors are
    IRLS-reweighted by sqrt(min(1, huber/||r||)) — the Gauss-Newton form
    of the Huber robust kernel.  Wrong cross-submap matches are the one
    outlier channel the submap pipeline has (measured ~10% of merged ids
    in dense fields); a quadratic cost lets each of them drag the whole
    anchor chain, a bounded-influence kernel caps them at gross-error
    scale."""
    p = poses[prob.obs_p]                     # (Fz, 3)
    l = landmarks[prob.obs_l]                 # (Fz, 2)
    r, A, B = jax.vmap(obs_residual)(p, l, prob.obs_z)
    W = prob.obs_sqrt_info
    m = (prob.obs_mask & prob.lm_mask[prob.obs_l]).astype(r.dtype)
    r = jnp.einsum("ok,fk->fo", W, r, precision=_HI) * m[:, None]
    A = jnp.einsum("ok,fkl->fol", W, A, precision=_HI) * m[:, None, None]
    B = jnp.einsum("ok,fkl->fol", W, B, precision=_HI) * m[:, None, None]
    if huber is not None:
        rn = jnp.sqrt(jnp.maximum((r * r).sum(-1), 1e-20))
        sw = jnp.sqrt(jnp.minimum(1.0, huber / rn))
        r = r * sw[:, None]
        A = A * sw[:, None, None]
        B = B * sw[:, None, None]
    return r, A, B


def _odo_terms(poses, prob):
    pi = poses[prob.odo_i]
    pj = poses[prob.odo_j]
    r, Ji, Jj = jax.vmap(odo_residual)(pi, pj, prob.odo_meas)
    W = prob.odo_sqrt_info
    m = prob.odo_mask.astype(r.dtype)
    r = jnp.einsum("ok,fk->fo", W, r, precision=_HI) * m[:, None]
    Ji = jnp.einsum("ok,fkl->fol", W, Ji, precision=_HI) * m[:, None, None]
    Jj = jnp.einsum("ok,fkl->fol", W, Jj, precision=_HI) * m[:, None, None]
    return r, Ji, Jj


def _schur_terms(poses, landmarks, prob, damping, huber=None):
    """Per-landmark-eliminated contributions to the reduced pose system.

    Returns (Hpp_red, bp_red, Hll_inv, Hlp_blocks...) — everything needed to
    back-substitute landmark updates.  This function is also the per-shard
    kernel of the distributed variant (landmark factors sharded).
    """
    K = poses.shape[0]
    M = landmarks.shape[0]
    r, A, B = _obs_terms(poses, landmarks, prob, huber)

    # Hll: (M, 2, 2) block diag, scatter-added over factors.
    Hll = jnp.zeros((M, 2, 2), poses.dtype).at[prob.obs_l].add(
        jnp.einsum("fok,fol->fkl", B, B, precision=_HI)
    )
    Hll = Hll + damping * jnp.eye(2, dtype=poses.dtype)[None]
    # bl: (M, 2)
    bl = jnp.zeros((M, 2), poses.dtype).at[prob.obs_l].add(
        jnp.einsum("fok,fo->fk", B, r, precision=_HI)
    )
    # Closed-form 2x2 inverse per landmark.
    a, b = Hll[:, 0, 0], Hll[:, 0, 1]
    c, d = Hll[:, 1, 0], Hll[:, 1, 1]
    det = jnp.maximum(a * d - b * c, 1e-12)
    Hll_inv = (
        jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        ) / det[:, None, None]
    )

    # Per-factor pose blocks.  Pose Hessian contributions:
    #   Hpp += A'A (scatter by pose), bp += A'r
    Hpp = jnp.zeros((K, 3, K, 3), poses.dtype)
    AtA = jnp.einsum("fok,fol->fkl", A, A, precision=_HI)
    Hpp = Hpp.at[prob.obs_p, :, prob.obs_p, :].add(AtA)
    bp = jnp.zeros((K, 3), poses.dtype).at[prob.obs_p].add(
        jnp.einsum("fok,fo->fk", A, r, precision=_HI)
    )

    # Schur: subtract  A'B Hll^-1 (B'A)  coupling through each landmark.
    # Build per-landmark W_l = sum_f(per-factor A'B for that landmark) is
    # NOT enough — the coupling pairs factors f, g sharing a landmark:
    #   sum_{f,g: l(f)=l(g)=l} A_f' B_f Hll_l^-1 B_g' A_g
    # = U_l' Hll_l^-1 U_l with U_l = sum_{f: l(f)=l} B_f' A_f  scattered by
    # pose... U depends on (landmark, pose) pairs.  Represent U as a dense
    # (M, 2, K, 3) only for small K*M; instead accumulate via factor pairs:
    # each factor's pose-side panel P_f = Hll_inv[l(f)] @ (B_f' A_f) (2,3),
    # then for every landmark the coupling is  sum_f sum_g  (B_f' A_f)'
    # Hll_inv (B_g' A_g).  We materialize G = (M, 2, K*3) via scatter-add —
    # fine at keyframe scale (K tens-to-hundreds).
    BtA = jnp.einsum("fok,fol->fkl", B, A, precision=_HI)   # (Fz, 2, 3)
    G = jnp.zeros((M, 2, K, 3), poses.dtype)
    G = G.at[prob.obs_l, :, prob.obs_p, :].add(BtA)
    G2 = G.reshape(M, 2, 3 * K)
    HinvG = jnp.einsum("mkl,mld->mkd", Hll_inv, G2, precision=_HI)
    Hpp_red = Hpp.reshape(3 * K, 3 * K) - jnp.einsum(
        "mkd,mke->de", G2, HinvG, precision=_HI
    )
    bp_red = bp.reshape(3 * K) - jnp.einsum(
        "mkd,mk->d", HinvG, bl, precision=_HI
    )
    return Hpp_red, bp_red, bl, Hll_inv, G2


def _pose_only_terms(poses, prob):
    """Odometry + prior contributions to the pose system (landmark-free)."""
    K = poses.shape[0]
    r, Ji, Jj = _odo_terms(poses, prob)
    Hpp = jnp.zeros((K, 3, K, 3), poses.dtype)
    Hpp = Hpp.at[prob.odo_i, :, prob.odo_i, :].add(
        jnp.einsum("fok,fol->fkl", Ji, Ji, precision=_HI))
    Hpp = Hpp.at[prob.odo_j, :, prob.odo_j, :].add(
        jnp.einsum("fok,fol->fkl", Jj, Jj, precision=_HI))
    Hpp = Hpp.at[prob.odo_i, :, prob.odo_j, :].add(
        jnp.einsum("fok,fol->fkl", Ji, Jj, precision=_HI))
    Hpp = Hpp.at[prob.odo_j, :, prob.odo_i, :].add(
        jnp.einsum("fok,fol->fkl", Jj, Ji, precision=_HI))
    bp = jnp.zeros((K, 3), poses.dtype)
    bp = bp.at[prob.odo_i].add(jnp.einsum("fok,fo->fk", Ji, r, precision=_HI))
    bp = bp.at[prob.odo_j].add(jnp.einsum("fok,fo->fk", Jj, r, precision=_HI))

    # Prior on pose 0 anchors the gauge (residual 0 at current estimate
    # contributes only to H, pulling the update toward keeping pose 0).
    P0 = prob.prior_sqrt_info.T @ prob.prior_sqrt_info
    Hpp = Hpp.at[0, :, 0, :].add(P0)
    return Hpp.reshape(3 * K, 3 * K), bp.reshape(3 * K)


def gn_step(prob: BAProblem, damping, huber=None):
    """One damped Gauss-Newton step.  Returns (new_poses, new_landmarks)."""
    K = prob.poses.shape[0]
    Hpp_o, bp_o = _pose_only_terms(prob.poses, prob)
    Hpp_red, bp_red, bl, Hll_inv, G2 = _schur_terms(
        prob.poses, prob.landmarks, prob, damping, huber
    )
    H = Hpp_o + Hpp_red + damping * jnp.eye(3 * K, dtype=prob.poses.dtype)
    b = bp_o + bp_red
    # Normal equations are H dx = -J^T r (residual convention r = z - h,
    # J = dr/dx, minimize ||r + J dx||^2).
    dp = jnp.linalg.solve(H, -b)                         # (3K,)

    # Back-substitute landmarks: dl = Hll^-1 (-bl - G dp).
    Gdp = jnp.einsum("mkd,d->mk", G2, dp, precision=_HI)
    dl = jnp.einsum("mkl,ml->mk", Hll_inv, -bl - Gdp, precision=_HI)

    poses = prob.poses + dp.reshape(K, 3)
    poses = poses.at[:, 2].set(mpi_to_pi(poses[:, 2]))
    lm = prob.landmarks + dl * prob.lm_mask[:, None]
    return poses, lm


@functools.partial(jax.jit, static_argnums=(1,))
def gauss_newton(prob: BAProblem, iters: int = 10, damping: float = 1e-6,
                 huber=None):
    """Run `iters` damped GN steps; returns the optimized problem + final
    total squared residual (masked).  `huber` (whitened sigmas) enables
    IRLS robust observation factors (see _obs_terms)."""

    def body(p, _):
        poses, lm = gn_step(p, damping, huber)
        return p._replace(poses=poses, landmarks=lm), ()

    prob, _ = lax.scan(body, prob, None, length=iters)
    return prob, total_cost(prob)


def total_cost(prob: BAProblem):
    r_o, _, _ = _odo_terms(prob.poses, prob)
    r_z, _, _ = _obs_terms(prob.poses, prob.landmarks, prob)
    return jnp.sum(r_o**2) + jnp.sum(r_z**2)
