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

    # --- PHt = P @ H^T, exploiting H sparsity: per obs only 5 columns of P
    # participate (3 pose + 2 feature).  (dim, max_nz, 2) -> (dim, 2nz).
    col_idx = jnp.stack([fpos, fpos + 1], axis=-1)          # (max_nz, 2)
    Pf = P[:, col_idx]                                       # (dim, max_nz, 2)
    PHt = jnp.einsum("dk,nok->dno", P[:, :3], Hp, precision=_HI)
    PHt = PHt + jnp.einsum("dnk,nok->dno", Pf, Hf, precision=_HI)
    PHt2 = PHt.reshape(dim, m2)

    # --- S = H @ PHt + RR: gather the 5 relevant rows of PHt per obs.
    PHt_pose = PHt2[:3]                                      # (3, 2nz)
    PHt_feat = PHt2[col_idx]                                 # (max_nz, 2, 2nz)
    S = jnp.einsum("nok,km->nom", Hp, PHt_pose, precision=_HI)
    S = S + jnp.einsum("nok,nkm->nom", Hf, PHt_feat, precision=_HI)
    S = S.reshape(m2, m2)

    # Block-diagonal noise: R for real observations, I for padded slots
    # (keeps S well-conditioned; padded blocks decouple exactly).
    Rb = jnp.asarray(R, x.dtype)
    blocks = jnp.where(mask[:, None, None], Rb[None], jnp.eye(2, dtype=x.dtype))
    RR = (
        jnp.zeros((max_nz, 2, max_nz, 2), x.dtype)
        .at[jnp.arange(max_nz), :, jnp.arange(max_nz), :]
        .set(blocks)
        .reshape(m2, m2)
    )
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
    # Out-of-bounds index for masked entries => dropped by the scatter.
    rows = jnp.where(mask, rows, dim)
    row_idx = jnp.stack([rows, rows + 1], axis=-1).reshape(-1)  # (2*max_new,)

    x = x.at[row_idx].set(
        jnp.stack([fx, fy], axis=-1).reshape(-1), mode="drop"
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
    # existing feature (ref ekf.jl:115-118); columns of still-empty slots are
    # zero and get fixed up by the pairwise block below.
    A = jnp.einsum("nok,kd->nod", Gv, P[:3, :], precision=_HI)
    A2 = A.reshape(2 * max_new, dim)
    P = P.at[row_idx, :].set(A2, mode="drop")
    P = P.at[:, row_idx].set(A2.T, mode="drop")

    # Pairwise blocks among the new features (incl. their own covariance,
    # ref ekf.jl:111): Gv_i P33 Gv_j^T + delta_ij * Gz_i R Gz_i^T.
    P33 = P[:3, :3]  # unchanged by the scatters above
    Rb = jnp.asarray(R, x.dtype)
    B = jnp.einsum("iok,kl,jpl->iojp", Gv, P33, Gv, precision=_HI)
    D = jnp.einsum("iok,kl,ipl->iop", Gz, Rb, Gz, precision=_HI)
    B = B.at[jnp.arange(max_new), :, jnp.arange(max_new), :].add(D)
    B2 = B.reshape(2 * max_new, 2 * max_new)
    P = P.at[row_idx[:, None], row_idx[None, :]].set(B2, mode="drop")

    # Clamp at capacity: overflow features were OOB-dropped by the scatters
    # above (the first capacity-n masked features are the ones kept).
    cap = (dim - 3) // 2
    n_new = jnp.minimum(n + jnp.sum(mi, dtype=n.dtype), cap).astype(n.dtype)
    return EKFState(x=x, P=P, n=n_new)
