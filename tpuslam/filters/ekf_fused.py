"""Fused-epoch EKF: every covariance effect of one observation epoch —
multi-tick time update, batched Kalman downdate, feature augmentation —
applied to P as ONE symmetric block rank-k update

    P' = P + X^T Y + Y^T X

where X, Y are thin (k x dim) panels, k = 3 + 2*max_nz(+new).  Why: the
covariance IS the working set (dim^2 floats); the modular pipeline
(predict -> update -> augment as separate ops, filters/ekf.py) makes XLA
stream P through ~30+ fused kernels per epoch — measured 20x off the HBM
roofline at cap=1024.  Panel algebra reduces the epoch to

  pass 1:  PHt0 = P @ Hd^T                (read P once)
  pass 2+3: Delta = X^T Y; P' = P + Delta + Delta^T   (read P once, write once)

Derivation (each step exact, composing filters/ekf.py's math):

  predict (accumulated over the epoch's ticks, see ekf.predict_accumulate):
    P_pred = M P M^T + U^T Qacc U,  M = I + U^T Dg U,  Dg = Gt - I,
    U = one-hot pose rows (3, dim)
           = P + U^T Z2 + Z2^T U,   Z2 = Dg P[0:3,:] + 0.5 Cp U,
             Cp = Dg P33 Dg^T + Qacc   (symmetric)
  update:  - W1 W1^T  ==  pair (W1^T, -0.5 W1^T)    [W1 from the PREDICTED
           PHt = PHt0 + Z2^T (U Hd^T) + U^T (Z2 Hd^T), small corrections]
  augment: E^T A_aug + A_aug^T E                     [A from the POST-UPDATE
           pose rows = P_pred[0:3,:] - W1[0:3] W1^T, computable from panels]

Equivalence with the modular path is asserted to float64 tightness in
tests/test_ekf_fused.py and against the NumPy oracle in the golden suite.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from tpuslam.filters.ekf import _dense_H, _onehot_rows, innovation_terms
from tpuslam.filters.state import EKFState

_HI = lax.Precision.HIGHEST


def fused_epoch_apply(
    state: EKFState,
    pose_pred,        # (3,) pose mean after the epoch's control ticks
    Gt,               # (3, 3) accumulated motion Jacobian product
    Qacc,             # (3, 3) accumulated process noise
    z, matched, new, idf,   # observation batch + association decisions
    R,
    upd_active,       # bool: did the epoch's final tick execute?
) -> EKFState:
    """Apply one epoch's predict + update + augment in fused panel form."""
    x, P = state.x, state.P
    dtype = x.dtype
    dim = x.shape[0]
    cap = (dim - 3) // 2
    max_nz = z.shape[0]
    m2 = 2 * max_nz
    act = jnp.asarray(upd_active)
    actf = act.astype(dtype)

    # ---------------- predict panels ----------------
    Prow3 = P[:3, :]                                   # (3, dim)
    P33 = P[:3, :3]
    Dg = Gt - jnp.eye(3, dtype=dtype)
    Cp = jnp.einsum("ik,kl,jl->ij", Dg, P33, Dg, precision=_HI) + Qacc
    Z2 = jnp.matmul(Dg, Prow3, precision=_HI)
    Z2 = Z2.at[:, :3].add(0.5 * Cp)                    # + 0.5 Cp U
    U = jnp.zeros((3, dim), dtype).at[:, :3].set(jnp.eye(3, dtype=dtype))

    # Predicted small blocks (closed form, no P materialization).
    P33_pred = (
        jnp.einsum("ik,kl,jl->ij", Gt, P33, Gt, precision=_HI) + Qacc
    )
    Prow3_pred = Prow3 + Z2
    Prow3_pred = Prow3_pred.at[:, :3].add(Z2[:, :3].T)

    # Predicted mean.
    x_pred = x.at[:3].set(pose_pred)

    # ---------------- update panels ----------------
    matched = matched & act
    st_pred_view = EKFState(x=x_pred, P=P, n=state.n)  # P only used via Hd
    v, Hp, Hf, fpos = innovation_terms(st_pred_view, z, matched, idf)
    Hd = _dense_H(Hp, Hf, fpos, dim)                   # (m2, dim)

    # THE P read pass: PHt0 and S0 fused in one stream over P (Pallas on
    # TPU, two XLA matmuls elsewhere), then rank-3 predict corrections.
    from tpuslam.kernels.dispatch import use_pallas_for
    from tpuslam.kernels.pht_s import pht_and_s, pht_and_s_ref

    if use_pallas_for(dim, "pht_s"):
        PHt0, S0 = pht_and_s(P, Hd)
    else:
        PHt0, S0 = pht_and_s_ref(P, Hd)

    UHt = Hd[:, :3].T                                  # (3, m2)
    Z2Ht = jnp.matmul(Z2, Hd.T, precision=_HI)         # (3, m2)
    PHt = PHt0 + jnp.matmul(Z2.T, UHt, precision=_HI)
    PHt = PHt.at[:3, :].add(Z2Ht)

    # S = Hd @ PHt decomposed: S0 + (Hd Z2^T) UHt + Hd[:, :3] Z2Ht.
    S = S0 + jnp.matmul(Z2Ht.T, UHt, precision=_HI)
    S = S + jnp.matmul(UHt.T, Z2Ht, precision=_HI)
    Rb = jnp.asarray(R, dtype)
    blocks = jnp.where(
        matched[:, None, None], Rb[None], jnp.eye(2, dtype=dtype)
    )
    RR = (
        jnp.eye(max_nz, dtype=dtype)[:, None, :, None]
        * blocks[:, :, None, :]
    ).reshape(m2, m2)
    S = S + RR
    S = 0.5 * (S + S.T)

    # Gain factor via the small explicit triangular inverse (the reference's
    # own formulation, src/ekf.jl:70-71: C = inv(chol(S)); W1 = PHt*C): a
    # triangular solve with a dim-sized RHS is a sequential substitution on
    # TPU, while inverting the (m2, m2) factor once and applying it as a
    # matmul keeps the dim-sized work on the MXU (measured ~2x on the
    # cap-1024 fused phase).
    L = jnp.linalg.cholesky(S)
    Linv = solve_triangular(L, jnp.eye(m2, dtype=dtype), lower=True)
    W1 = jnp.matmul(PHt, Linv.T, precision=_HI)        # (dim, m2)
    W1 = W1 * actf                                     # inactive => no-op
    u = jnp.matmul(Linv, v.reshape(m2), precision=_HI)

    x_upd = x_pred + jnp.matmul(W1, u, precision=_HI)
    pose_upd = x_upd[:3]
    P33_upd = P33_pred - jnp.matmul(
        W1[:3], W1[:3].T, precision=_HI
    )
    Prow3_upd = Prow3_pred - jnp.matmul(
        W1[:3], W1.T, precision=_HI
    )

    # ---------------- augment panels ----------------
    new = new & act
    mi = new.astype(jnp.int32)
    r, bb = z[:, 0], z[:, 1]
    phi = pose_upd[2]
    s = jnp.sin(phi + bb)
    c = jnp.cos(phi + bb)
    fx = pose_upd[0] + r * c
    fy = pose_upd[1] + r * s

    n = state.n
    pos = n + jnp.cumsum(mi) - mi
    rows = 3 + 2 * pos
    rows = jnp.where(new, rows, dim)
    row_idx = jnp.stack([rows, rows + 1], axis=-1).reshape(-1)
    E = _onehot_rows(row_idx, dim, dtype)              # (2*max_nz, dim)

    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    Gv = jnp.stack(
        [jnp.stack([one, zero, -r * s], axis=-1),
         jnp.stack([zero, one, r * c], axis=-1)], axis=-2)
    Gz = jnp.stack(
        [jnp.stack([c, -r * s], axis=-1),
         jnp.stack([s, r * c], axis=-1)], axis=-2)

    A = jnp.einsum("nok,kd->nod", Gv, Prow3_upd, precision=_HI)
    A2 = A.reshape(m2, dim)
    B = jnp.einsum("iok,kl,jpl->iojp", Gv, P33_upd, Gv, precision=_HI)
    D = jnp.einsum("iok,kl,ipl->iop", Gz, Rb, Gz, precision=_HI)
    B = B + jnp.eye(max_nz, dtype=dtype)[:, None, :, None] * D[:, :, None, :]
    B2 = B.reshape(m2, m2)
    A_aug = A2 + 0.5 * jnp.matmul(B2, E, precision=_HI)

    x_new = x_upd + jnp.matmul(
        jnp.stack([fx * new, fy * new], axis=-1).reshape(-1), E,
        precision=_HI,
    )

    # ---------------- the single symmetric rank-k application ----------------
    from tpuslam.kernels.sym_rank_k import (
        symmetric_rank_k_update,
        symmetric_rank_k_update_ref,
    )

    X = jnp.concatenate([U, E, W1.T], axis=0)          # (3 + 2m + m2, dim)
    Y = jnp.concatenate([Z2, A_aug, -0.5 * W1.T], axis=0)
    if use_pallas_for(dim, "rank_k"):
        P_new = symmetric_rank_k_update(P, X, Y)
    else:
        P_new = symmetric_rank_k_update_ref(P, X, Y)

    n_new = jnp.minimum(
        n + jnp.sum(mi, dtype=n.dtype), cap
    ).astype(n.dtype)
    return EKFState(x=x_new, P=P_new, n=n_new)


def predicted_assoc_blocks(state: EKFState, Gt, Qacc):
    """Small predicted-covariance blocks for association on the predicted
    state WITHOUT materializing P_pred:
      P33_pred = Gt P33 Gt^T + Qacc          (3, 3)
      P3f_pred = Gt P[0:3, 3:] gathered      (cap, 3, 2)
      Pff_pred = Pff (predict never touches feature-feature blocks,
                 ref src/ekf.jl:32-36)       (cap, 2, 2)
    """
    P = state.P
    cap = state.capacity
    dtype = P.dtype
    P33_pred = (
        jnp.einsum("ik,kl,jl->ij", Gt, P[:3, :3], Gt, precision=_HI) + Qacc
    )
    Ppm_pred = jnp.matmul(Gt, P[:3, 3:], precision=_HI)  # (3, 2cap)
    P3f_pred = jnp.moveaxis(
        Ppm_pred.reshape(3, cap, 2), 0, 1
    )                                                   # (cap, 3, 2)
    col0 = 3 + 2 * jnp.arange(cap)
    cols = jnp.stack([col0, col0 + 1], axis=-1)
    Pff = P[cols[:, :, None], cols[:, None, :]]         # (cap, 2, 2)
    return P33_pred, P3f_pred, Pff
