"""EKF-SLAM predict / update / augment over the fixed-capacity masked state.

Behavioral spec: reference src/ekf.jl (predict :8-43, update :46-77,
add_features :84-122).  The math is identical; the *architecture* is not:

  * static shapes — observation batches are padded to `max_nz` with a mask;
    a masked observation provably contributes zero gain (its Jacobian rows
    are zeroed, so the corresponding Kalman-gain columns vanish);
  * H is never materialized as a dense (2nz, dim) matrix — the reference's
    dense products (ekf.jl:67-68) become 5-column gathers + small einsums
    exploiting the 2x3 / 2x2 block sparsity of H (src/common.jl:160-162);
  * augmentation (dynamic shape growth, ekf.jl:108-109) becomes an
    out-of-bounds-dropped scatter into the preallocated state;
  * the Cholesky-based gain and the symmetric rank-2nz downdate
    `P -= W1 @ W1.T` (ekf.jl:70-75) are preserved for numerical stability
    (TPUs have no f64; the square-root-ish downdate keeps P PSD in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from tpuslam.core.geometry import mpi_to_pi
from tpuslam.core.motion import motion_jacobians
from tpuslam.core.observation import predict_observation_xy
from tpuslam.filters.state import EKFState

# Covariance algebra must run in true f32 on the MXU (default TPU matmul
# precision downcasts f32 operands to bf16, which destroys a covariance
# filter's conditioning).
_HI = lax.Precision.HIGHEST


def predict(state: EKFState, speed, gamma, wheelbase, Q, dt) -> EKFState:
    """EKF time update for pose + covariance.

    Ref src/ekf.jl:8-43.  Uses the *measured* (noisy) speed / steering angle
    (ekf.jl:14-15).  O(n): only the pose rows/columns of P change.
    """
    x, P = state.x, state.P
    phi = x[2]
    Gv, Gu = motion_jacobians(phi, speed, gamma, wheelbase, dt)

    P33 = P[:3, :3]
    Qc = jnp.asarray(Q, P.dtype)
    new_P33 = (
        jnp.einsum("ik,kl,jl->ij", Gv, P33, Gv, precision=_HI)
        + jnp.einsum("ik,kl,jl->ij", Gu, Qc, Gu, precision=_HI)
    )
    new_Ppm = jnp.matmul(Gv, P[:3, 3:], precision=_HI)  # (3, 2*cap)

    P = P.at[:3, 3:].set(new_Ppm)
    P = P.at[3:, :3].set(new_Ppm.T)
    P = P.at[:3, :3].set(new_P33)

    vdt = speed * dt
    pose = jnp.stack(
        [
            x[0] + vdt * jnp.cos(gamma + phi),
            x[1] + vdt * jnp.sin(gamma + phi),
            mpi_to_pi(phi + vdt * jnp.sin(gamma) / wheelbase),
        ]
    )
    x = x.at[:3].set(pose)
    return EKFState(x=x, P=P, n=state.n)


def predict_accumulate(carry, speed, gamma, wheelbase, Q, dt):
    """One tick of closed-form predict accumulation.

    The reference applies the covariance time update to the FULL P every
    control tick (src/ekf.jl:32-36) even though consecutive predicts compose:
        P33 <- Gt P33 Gt' + Qacc,   Ppm <- Gt Ppm
    with Gt the product of per-tick pose Jacobians and Qacc the accumulated
    process noise (Qacc <- Gv Qacc Gv' + Gu Q Gu').  Evolving only the O(1)
    pose mean + (Gt, Qacc) per tick and touching P ONCE per observation
    epoch is algebraically exact and removes 8 of 9 O(cap) covariance
    passes.  carry = (pose_mean (3,), Gt (3,3), Qacc (3,3)).
    """
    pose, Gt, Qacc = carry
    phi = pose[2]
    Gv, Gu = motion_jacobians(phi, speed, gamma, wheelbase, dt)
    Qc = jnp.asarray(Q, pose.dtype)
    Qacc = (
        jnp.einsum("ik,kl,jl->ij", Gv, Qacc, Gv, precision=_HI)
        + jnp.einsum("ik,kl,jl->ij", Gu, Qc, Gu, precision=_HI)
    )
    Gt = Gv @ Gt
    vdt = speed * dt
    pose = jnp.stack(
        [
            pose[0] + vdt * jnp.cos(gamma + phi),
            pose[1] + vdt * jnp.sin(gamma + phi),
            mpi_to_pi(phi + vdt * jnp.sin(gamma) / wheelbase),
        ]
    )
    return pose, Gt, Qacc


def predict_accumulator_init(pose, dtype=None):
    dtype = dtype or pose.dtype
    return (
        jnp.asarray(pose, dtype),
        jnp.eye(3, dtype=dtype),
        jnp.zeros((3, 3), dtype),
    )


def apply_predict(state: EKFState, pose, Gt, Qacc) -> EKFState:
    """Apply an accumulated multi-tick time update to the covariance (one
    O(cap) pass; see predict_accumulate)."""
    P = state.P
    new_P33 = (
        jnp.einsum("ik,kl,jl->ij", Gt, P[:3, :3], Gt, precision=_HI) + Qacc
    )
    new_Ppm = jnp.matmul(Gt, P[:3, 3:], precision=_HI)
    P = P.at[:3, 3:].set(new_Ppm)
    P = P.at[3:, :3].set(new_Ppm.T)
    P = P.at[:3, :3].set(new_P33)
    x = state.x.at[:3].set(pose)
    return EKFState(x=x, P=P, n=state.n)


def innovation_terms(state: EKFState, z, mask, idf):
    """Per-observation innovation v and masked sparse-H blocks.

    Returns (v, Hp, Hf, fpos):
      v:   (max_nz, 2) innovation, zero where masked
      Hp:  (max_nz, 2, 3) pose Jacobian blocks, zero where masked
      Hf:  (max_nz, 2, 2) feature Jacobian blocks, zero where masked
      fpos:(max_nz,) column/row offset of each feature block in the flat state
    """
    x = state.x
    pose = x[:3]
    fpos = 3 + 2 * idf
    feats = x[jnp.stack([fpos, fpos + 1], axis=-1)]  # (max_nz, 2)

    zp, Hp, Hf = jax.vmap(lambda f: predict_observation_xy(pose, f))(feats)
    v = jnp.stack(
        [z[:, 0] - zp[:, 0], mpi_to_pi(z[:, 1] - zp[:, 1])], axis=-1
    )
    m = mask.astype(x.dtype)
    return v * m[:, None], Hp * m[:, None, None], Hf * m[:, None, None], fpos


def _dense_H(Hp, Hf, fpos, dim):
    """Assemble the dense (2*max_nz, dim) observation Jacobian from its
    sparse blocks with broadcasted one-hot placement (no scatter).

    Row 2i/2i+1 has Hp_i in columns 0:3 and Hf_i in columns fpos_i:fpos_i+2
    (ref src/common.jl:160-162)."""
    max_nz = Hp.shape[0]
    cols = jnp.arange(dim)
    # Pose block: static columns 0:3.
    pose_part = jnp.zeros((max_nz, 2, dim), Hp.dtype).at[:, :, :3].set(Hp)
    # Feature block: columns fpos, fpos+1 via one-hot masks.
    is_f0 = (cols[None, :] == fpos[:, None]).astype(Hp.dtype)  # (max_nz, dim)
    is_f1 = (cols[None, :] == (fpos + 1)[:, None]).astype(Hp.dtype)
    feat_part = (
        Hf[:, :, 0:1] * is_f0[:, None, :] + Hf[:, :, 1:2] * is_f1[:, None, :]
    )
    return (pose_part + feat_part).reshape(2 * max_nz, dim)


def _onehot_rows(row_idx, dim, dtype):
    """(k, dim) one-hot selection matrix; out-of-range indices give zero
    rows (the matmul analog of a dropped scatter)."""
    return (row_idx[:, None] == jnp.arange(dim)[None, :]).astype(dtype)


def update(state: EKFState, z, mask, idf, R) -> EKFState:
    """Batched joint EKF measurement update (the hot kernel).

    Ref src/ekf.jl:46-77.  `z`: (max_nz, 2) range-bearing observations;
    `mask`: (max_nz,) bool — which slots are real; `idf`: (max_nz,) int32
    associated feature index per observation (garbage where masked);
    `R`: (2, 2) per-observation noise.

    Masked slots get H rows = 0, v = 0 and an identity noise block, which
    makes S block-diagonal between real and padded slots and the padded
    Kalman-gain columns exactly zero — a no-op, not an approximation.
    """
    x, P = state.x, state.P
    max_nz = z.shape[0]
    dim = x.shape[0]
    m2 = 2 * max_nz

    v, Hp, Hf, fpos = innovation_terms(state, z, mask, idf)

    # --- Materialize the sparse H densely as (2nz, dim) via broadcasted
    # one-hot placement (NO gather/scatter: dynamic-index memory ops are the
    # bottleneck on TPU — measured ~20x slower than streaming the same data
    # through the MXU as 0/1-weighted matmuls).  Adding zeros is exact, so
    # this is bit-equivalent to the 5-column gather formulation.
    Hd = _dense_H(Hp, Hf, fpos, dim)                         # (m2, dim)

    # --- PHt = P @ H^T and S = H @ PHt: two MXU matmuls.
    PHt2 = jnp.matmul(P, Hd.T, precision=_HI)                # (dim, m2)
    S = jnp.matmul(Hd, PHt2, precision=_HI)                  # (m2, m2)

    # Block-diagonal noise: R for real observations, I for padded slots
    # (keeps S well-conditioned; padded blocks decouple exactly).  Built by
    # broadcast (eye * blocks), not scatter — TPU scatters are slow.
    Rb = jnp.asarray(R, x.dtype)
    blocks = jnp.where(mask[:, None, None], Rb[None], jnp.eye(2, dtype=x.dtype))
    RR = (
        jnp.eye(max_nz, dtype=x.dtype)[:, None, :, None]
        * blocks[:, :, None, :]
    ).reshape(m2, m2)
    S = S + RR
    S = 0.5 * (S + S.T)  # symmetrize, ref ekf.jl:69

    # --- Cholesky gain + symmetric downdate (ref ekf.jl:70-75):
    #   L = chol(S);  W1 = PHt L^-T;  W = W1 L^-1 = PHt S^-1
    L = jnp.linalg.cholesky(S)
    W1 = solve_triangular(L, PHt2.T, lower=True).T           # PHt @ L^-T
    W = solve_triangular(L.T, W1.T, lower=False).T           # W1 @ L^-1

    x = x + jnp.matmul(W, v.reshape(m2), precision=_HI)
    P = P - jnp.matmul(W1, W1.T, precision=_HI)
    return EKFState(x=x, P=P, n=state.n)


def add_features(state: EKFState, z, mask, R) -> EKFState:
    """Append new features to the state as a masked scatter.

    Ref src/ekf.jl:84-122.  The reference appends sequentially (hcat/vcat
    growth); here all new features land in one batched scatter.  The
    sequential cross-covariances between features added in the same batch
    reduce to the closed form  P[i_new, j_new] = Gv_i @ P33 @ Gv_j^T  (the
    pose block P33 is unchanged by augmentation), so batching is exact.

    `z`: (max_new, 2) new-feature observations; `mask`: (max_new,) bool;
    `R`: (2, 2).  Ordering: new features occupy slots n, n+1, ... in
    observation order (matches the reference's append order).
    """
    x, P, n = state.x, state.P, state.n
    dim = x.shape[0]
    max_new = z.shape[0]
    mi = mask.astype(jnp.int32)

    r, b = z[:, 0], z[:, 1]
    phi = x[2]
    s = jnp.sin(phi + b)
    c = jnp.cos(phi + b)

    # Feature means (ref ekf.jl:94-99).
    fx = x[0] + r * c
    fy = x[1] + r * s

    # Destination slot per new feature: n + (exclusive cumsum of mask).
    pos = n + jnp.cumsum(mi) - mi                      # (max_new,)
    rows = 3 + 2 * pos                                 # start row per feature
    # Out-of-bounds index for masked entries => zero one-hot row (the matmul
    # analog of a dropped scatter).
    rows = jnp.where(mask, rows, dim)
    row_idx = jnp.stack([rows, rows + 1], axis=-1).reshape(-1)  # (2*max_new,)

    # One-hot selection of the new rows: all covariance writes below become
    # MXU matmuls instead of dynamic scatters (TPU scatters on the big P are
    # the measured bottleneck).  The new slots are zero in P (class
    # invariant), so the writes are pure additions.
    E = _onehot_rows(row_idx, dim, x.dtype)            # (2*max_new, dim)

    x = x + jnp.matmul(
        jnp.stack([fx * mask, fy * mask], axis=-1).reshape(-1), E,
        precision=_HI,
    )

    # Jacobians (ref ekf.jl:102-103).
    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    Gv = jnp.stack(
        [
            jnp.stack([one, zero, -r * s], axis=-1),
            jnp.stack([zero, one, r * c], axis=-1),
        ],
        axis=-2,
    )                                                   # (max_new, 2, 3)
    Gz = jnp.stack(
        [
            jnp.stack([c, -r * s], axis=-1),
            jnp.stack([s, r * c], axis=-1),
        ],
        axis=-2,
    )                                                   # (max_new, 2, 2)

    # New rows against the *old* state: covers the pose block and every
    # existing feature (ref ekf.jl:115-118).  New-slot columns of A are zero
    # (P[:3, new] == 0), so adding E^T A + A^T E + E^T B E writes the new
    # rows, columns and pairwise blocks without double counting — three MXU
    # matmul rank-updates, no scatter.
    A = jnp.einsum("nok,kd->nod", Gv, P[:3, :], precision=_HI)
    A2 = A.reshape(2 * max_new, dim)

    # Pairwise blocks among the new features (incl. their own covariance,
    # ref ekf.jl:111): Gv_i P33 Gv_j^T + delta_ij * Gz_i R Gz_i^T.
    P33 = P[:3, :3]
    Rb = jnp.asarray(R, x.dtype)
    B = jnp.einsum("iok,kl,jpl->iojp", Gv, P33, Gv, precision=_HI)
    D = jnp.einsum("iok,kl,ipl->iop", Gz, Rb, Gz, precision=_HI)
    # Diagonal-block add via broadcast (eye * D), not scatter.
    B = B + jnp.eye(max_new, dtype=x.dtype)[:, None, :, None] * D[:, :, None, :]
    B2 = B.reshape(2 * max_new, 2 * max_new)

    # Fold the symmetric pairwise block into the row panel (B2 = B2^T), so
    # the whole augmentation is ONE symmetric rank-k update:
    #   P += E^T A_aug + (E^T A_aug)^T,  A_aug = A + 0.5 B E.
    A_aug = A2 + 0.5 * jnp.matmul(B2, E, precision=_HI)
    EtA = jnp.matmul(E.T, A_aug, precision=_HI)        # (dim, dim) rank-k
    P = P + EtA + EtA.T

    # Clamp at capacity: overflow features were OOB-dropped by the scatters
    # above (the first capacity-n masked features are the ones kept).
    cap = (dim - 3) // 2
    n_new = jnp.minimum(n + jnp.sum(mi, dtype=n.dtype), cap).astype(n.dtype)
    return EKFState(x=x, P=P, n=n_new)
