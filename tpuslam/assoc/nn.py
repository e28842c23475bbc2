"""Gated nearest-neighbor data association, fully vectorized.

Behavioral spec: reference src/data-association.jl:1-63.  The reference runs
a Python-style double loop (nz x Nf) and, per candidate pair, builds a dense
2 x n Jacobian and computes H*P*H' as a dense n^2 product
(data-association.jl:56-59) — O(nz * Nf * n^2) as written.  Here:

  * the innovation covariance S_j depends only on the *feature* (not the
    observation), and only on a 5x5 submatrix of P — S is computed once per
    feature slot from gathered 3x3/3x2/2x2 blocks: O(Nf);
  * all (obs, feature) pair scores are one batched masked Mahalanobis
    evaluation with a closed-form 2x2 inverse / logdet: O(nz * Nf);
  * the *decision semantics are reproduced exactly*, including the
    order-dependent `outer` bookkeeping: the reference's running
    nearest-neighbor accepts feature j only if it strictly improves the best
    normalized distance seen so far (a prefix-minimum), and every candidate
    that was NOT a running best at its visit time feeds the `outer` NIS
    minimum that gates new-feature creation (data-association.jl:29-48).

Decision per observation (ref data-association.jl:42-48):
  matched      <- any gated candidate (NIS < gate1); target = argmin nd
  new feature  <- not matched AND min NIS over non-running-best > gate2
  dropped      <- otherwise (ambiguous)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpuslam.core.geometry import mpi_to_pi
from tpuslam.core.observation import predict_observations_batch
from tpuslam.filters.state import EKFState

_HI = lax.Precision.HIGHEST
_INF = jnp.inf


def _gather_feature_cov_blocks(P, cap):
    """P3f: (cap, 3, 2) pose-feature blocks; Pff: (cap, 2, 2) diag blocks."""
    col0 = 3 + 2 * jnp.arange(cap)
    cols = jnp.stack([col0, col0 + 1], axis=-1)           # (cap, 2)
    P3f = jnp.moveaxis(P[:3, cols], 0, 1)                  # (cap, 3, 2)
    Pff = P[cols[:, :, None], cols[:, None, :]]            # (cap, 2, 2)
    return P3f, Pff


def association_scores(state: EKFState, z, z_mask, R):
    """NIS and normalized-distance score matrices over all (obs, slot) pairs.

    Ref data-association.jl:53-63 (compute_association), batched.

    Returns (nis, nd): (max_nz, cap) with +inf at inactive slots / masked obs.
    """
    x, P = state.x, state.P
    cap = state.capacity
    P3f, Pff = _gather_feature_cov_blocks(P, cap)
    slot_active = jnp.arange(cap) < state.n
    return pair_scores(
        x[:3], state.features, P[:3, :3], P3f, Pff, z, z_mask, slot_active, R
    )


def pair_scores(pose, feats, P33, P3f, Pff, z, z_mask, slot_active, R):
    """Core batched Mahalanobis scoring given gathered covariance blocks.

    feats: (k, 2); P3f: (k, 3, 2); Pff: (k, 2, 2); z: (max_nz, 2).
    Shared by the single-chip path (k = cap) and the sharded path (k = the
    shard's local slots).  Returns (nis, nd): (max_nz, k).
    """
    zp, Hp, Hf = predict_observations_batch(pose, feats)

    # S_j = [Hp Hf] [[P33, P3f], [P3f', Pff]] [Hp Hf]' + R     (k, 2, 2)
    S = jnp.einsum("jok,kl,jpl->jop", Hp, P33, Hp, precision=_HI)
    cross = jnp.einsum("jok,jkl,jpl->jop", Hp, P3f, Hf, precision=_HI)
    S = S + cross + jnp.swapaxes(cross, -1, -2)
    S = S + jnp.einsum("jok,jkl,jpl->jop", Hf, Pff, Hf, precision=_HI)
    S = S + jnp.asarray(R, pose.dtype)[None]

    # Closed-form 2x2 inverse and logdet.
    a, b = S[:, 0, 0], S[:, 0, 1]
    c, d = S[:, 1, 0], S[:, 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    logdet = jnp.log(det)

    # Innovations for every (obs, slot) pair: (max_nz, cap, 2).
    dv_r = z[:, None, 0] - zp[None, :, 0]
    dv_b = mpi_to_pi(z[:, None, 1] - zp[None, :, 1])

    # v' S^-1 v with the closed-form inverse.
    nis = (
        d[None] * dv_r * dv_r
        - (b + c)[None] * dv_r * dv_b
        + a[None] * dv_b * dv_b
    ) * inv_det[None]
    nd = nis + logdet[None]

    valid = z_mask[:, None] & slot_active[None, :]
    nis = jnp.where(valid, nis, _INF)
    nd = jnp.where(valid, nd, _INF)
    return nis, nd


def associate(state: EKFState, z, z_mask, R, gate1, gate2):
    """Gated NN association over a padded observation batch.

    Args:
      z: (max_nz, 2) range-bearing observations.
      z_mask: (max_nz,) bool — real observations.
      R: (2, 2); gate1, gate2: NIS gates (ref sim/ekfslam-sim.jl:111-114).

    Returns:
      idf: (max_nz,) int32 — matched feature slot per obs (0 where unmatched).
      matched: (max_nz,) bool — obs associated to an existing feature.
      new: (max_nz,) bool — obs becomes a new feature.
    (Dropped observations are ~matched & ~new.)
    """
    nis, nd = association_scores(state, z, z_mask, R)
    return decide(nis, nd, z_mask, gate1, gate2)


def decide(nis, nd, z_mask, gate1, gate2):
    """The gating decision given (max_nz, cap) score matrices — exact
    reference semantics (see module docstring).  Shared by the single-chip
    and sharded association paths."""
    gated = nis < gate1                                   # (max_nz, cap)
    nd_gated = jnp.where(gated, nd, _INF)

    # Prefix-minimum reconstruction of the reference's sequential scan:
    # slot j was a "running best" iff gated and strictly better than every
    # gated slot before it (data-association.jl:33-41).
    cm = lax.cummin(nd_gated, axis=1)
    prev_best = jnp.concatenate(
        [jnp.full_like(cm[:, :1], _INF), cm[:, :-1]], axis=1
    )
    running_best = gated & (nd_gated < prev_best)

    matched = jnp.any(gated, axis=1) & z_mask
    idf = jnp.argmin(nd_gated, axis=1).astype(jnp.int32)

    # `outer` = min NIS over candidates that never became the running best
    # (includes gated-but-not-improving ones — the reference quirk).
    outer = jnp.min(jnp.where(running_best, _INF, nis), axis=1)
    new = (~matched) & (outer > gate2) & z_mask

    return idf, matched, new
