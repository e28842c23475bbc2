"""Fused-epoch covariance path for the SHARDED engine (the distributed
analog of filters/ekf_fused.py).

Per observation epoch, the entire covariance evolution lands on the
row-sharded landmark block Pmm as ONE rectangular rank-k update per shard

    Pmm_b' = Pmm_b + Xr_b^T Y + Yr_b^T X

(kernels/sym_rank_k.rank_k_update_rect), with the small replicated blocks
(Ppp, Ppm) updated in closed form.  The collective structure stays exactly
that of the unfused Schur update (parallel/ekf_sharded.py): ONE psum of the
(m2, m2) Schur system + ONE all_gather of the (2cap, m2) gain panel — but
the per-epoch Pmm traffic drops from ~10 full passes to 2 (read + write).

Predict never touches Pmm (ref src/ekf.jl:32-36), so unlike the dense fused
path there are no predict panels here — the accumulated (Gt, Qacc) apply
only to the replicated pose blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import PartitionSpec as P  # noqa: F401  (doc reference)

from tpuslam.assoc.nn import decide, pair_scores
from tpuslam.core.geometry import mpi_to_pi
from tpuslam.core.observation import predict_observation_xy
from tpuslam.kernels.dispatch import use_pallas_for
from tpuslam.kernels.sym_rank_k import (
    rank_k_update_rect,
    rank_k_update_rect_ref,
)
from tpuslam.parallel.ekf_sharded import BlockEKFState

_HI = lax.Precision.HIGHEST


def _predicted_blocks(st: BlockEKFState, Gt, Qacc):
    P33_pred = (
        jnp.einsum("ik,kl,jl->ij", Gt, st.Ppp, Gt, precision=_HI) + Qacc
    )
    Ppm_pred = jnp.matmul(Gt, st.Ppm, precision=_HI)
    return P33_pred, Ppm_pred


def associate_pred_shard(st: BlockEKFState, pose_pred, Gt, Qacc, z, z_mask,
                         R, gate1, gate2, *, axis: str = "map"):
    """Gated NN association on the PREDICTED sharded state: per-shard
    scoring of owned blocks + one score-panel all_gather (same pattern as
    parallel/sim_sharded.associate_shard, on closed-form predicted
    blocks)."""
    rows_local = st.Pmm.shape[0]
    cap_local = rows_local // 2
    b = lax.axis_index(axis)
    f0 = b * cap_local
    row0 = b * rows_local

    P33_pred, Ppm_pred = _predicted_blocks(st, Gt, Qacc)

    feats_local = lax.dynamic_slice(
        st.fm, (f0, jnp.zeros_like(f0)), (cap_local, 2)
    )
    P3f = lax.dynamic_slice(
        Ppm_pred, (jnp.zeros_like(row0), row0), (3, rows_local)
    ).reshape(3, cap_local, 2).transpose(1, 0, 2)
    lrow = 2 * jnp.arange(cap_local)
    rpairs = jnp.stack([lrow, lrow + 1], axis=-1)
    cpairs = rpairs + row0
    Pff = st.Pmm[rpairs[:, :, None], cpairs[:, None, :]]

    slot_active = (f0 + jnp.arange(cap_local)) < st.n
    nis_l, nd_l = pair_scores(
        pose_pred, feats_local, P33_pred, P3f, Pff, z, z_mask, slot_active, R
    )
    scores = lax.all_gather(
        jnp.stack([nis_l, nd_l]), axis, axis=2, tiled=True
    )
    return decide(scores[0], scores[1], z_mask, gate1, gate2)


def _ring_panel_update(Pmm_local, W1_m_local, Em, A_aug, row0, rows_local,
                       rect, axis):
    """Ring-ppermute gain-panel circulation (never materializes the full
    (2cap, m2) panel): at step t the panel that started on shard
    c = (b - t) mod D arrives here, and we update OUR rows' columns of
    block c with the combined augment + downdate rank-k — the blockwise
    ring structure of ring attention applied to the covariance downdate.
    """
    D = lax.axis_size(axis)
    b = lax.axis_index(axis)
    k = Em.shape[0]

    # Row-side panels for OUR rows are fixed across steps.
    Xr = jnp.concatenate(
        [
            lax.dynamic_slice(Em, (jnp.zeros_like(row0), row0),
                              (k, rows_local)),
            W1_m_local.T,
        ],
        axis=0,
    )
    Yr = jnp.concatenate(
        [
            lax.dynamic_slice(A_aug, (jnp.zeros_like(row0), row0),
                              (k, rows_local)),
            -0.5 * W1_m_local.T,
        ],
        axis=0,
    )
    perm = [(i, (i + 1) % D) for i in range(D)]

    def step(t, carry):
        Pmm, visiting = carry
        c = (b - t) % D
        col0 = c * rows_local
        Em_c = lax.dynamic_slice(Em, (jnp.zeros_like(col0), col0),
                                 (k, rows_local))
        Aa_c = lax.dynamic_slice(A_aug, (jnp.zeros_like(col0), col0),
                                 (k, rows_local))
        Xc = jnp.concatenate([Em_c, visiting.T], axis=0)
        Yc = jnp.concatenate([Aa_c, -0.5 * visiting.T], axis=0)
        block = lax.dynamic_slice(
            Pmm, (jnp.zeros_like(col0), col0), (rows_local, rows_local)
        )
        block = rect(block, Xr, Yr, Xc, Yc)
        Pmm = lax.dynamic_update_slice(
            Pmm, block, (jnp.zeros_like(col0), col0)
        )
        visiting = lax.ppermute(visiting, axis, perm)
        return Pmm, visiting

    Pmm, _ = lax.fori_loop(0, D, step, (Pmm_local, W1_m_local))
    return Pmm


def fused_epoch_apply_shard(st: BlockEKFState, pose_pred, Gt, Qacc,
                            z, matched, new, idf, R, upd_active,
                            *, axis: str = "map",
                            panel_exchange: str = "allgather"):
    """Apply one epoch's predict + update + augment to the sharded state.

    panel_exchange:
      'allgather' — ONE all_gather materializes the full (2cap, m2) gain
        panel, then one rectangular rank-k pass over the local Pmm block.
      'ring'      — the gain panel is never materialized: panels rotate
        around the mesh ring via ppermute and each shard updates one
        column block of its Pmm rows per step (the ring-attention pattern
        applied to covariance algebra, SURVEY.md section 5).  Total bytes
        moved match the all_gather, but peak panel memory is 1/D and each
        step's ppermute overlaps the previous block's compute.
    """
    dtype = st.pose.dtype
    cap = st.fm.shape[0]
    cap2 = 2 * cap
    rows_local = st.Pmm.shape[0]
    b = lax.axis_index(axis)
    row0 = b * rows_local
    max_nz = z.shape[0]
    m2 = 2 * max_nz
    act = jnp.asarray(upd_active)
    actf = act.astype(dtype)
    matched = matched & act
    new = new & act

    P33_pred, Ppm_pred = _predicted_blocks(st, Gt, Qacc)

    # ---- innovation terms on the predicted state (replicated).
    feats = st.fm[idf]
    zp, Hp, Hf = jax.vmap(
        lambda f: predict_observation_xy(pose_pred, f)
    )(feats)
    v = jnp.stack(
        [z[:, 0] - zp[:, 0], mpi_to_pi(z[:, 1] - zp[:, 1])], axis=-1
    )
    m = matched.astype(dtype)
    v = v * m[:, None]
    Hp = Hp * m[:, None, None]
    Hf = Hf * m[:, None, None]
    fcol = 2 * idf
    fcols = jnp.stack([fcol, fcol + 1], axis=-1)

    # ---- PHt pose rows (replicated) and map rows (local).
    Ppm_f = jnp.moveaxis(Ppm_pred[:, fcols], 0, 1)
    PHt_p = jnp.einsum("kl,nol->kno", P33_pred, Hp, precision=_HI)
    PHt_p = (PHt_p
             + jnp.einsum("nkl,nol->kno", Ppm_f, Hf, precision=_HI)
             ).reshape(3, m2)

    Pmp_local = lax.dynamic_slice(
        Ppm_pred, (jnp.zeros_like(row0), row0), (3, rows_local)
    ).T
    Pmm_f = st.Pmm[:, fcols]
    PHt_m = jnp.einsum("rk,nok->rno", Pmp_local, Hp, precision=_HI)
    PHt_m = (PHt_m
             + jnp.einsum("rnk,nok->rno", Pmm_f, Hf, precision=_HI)
             ).reshape(rows_local, m2)

    # ---- Schur system (ONE psum).
    lr = fcol - row0
    owner = (lr >= 0) & (lr < rows_local) & matched
    lrc = jnp.clip(jnp.stack([lr, lr + 1], axis=-1), 0, rows_local - 1)
    PHt_frows = PHt_m[lrc] * owner[:, None, None].astype(dtype)
    C_b = jnp.einsum("nok,nkm->nom", Hf, PHt_frows, precision=_HI)
    C = lax.psum(C_b.reshape(m2, m2), axis)

    S = jnp.einsum("nok,km->nom", Hp, PHt_p, precision=_HI).reshape(m2, m2)
    Rb = jnp.asarray(R, dtype)
    blocks = jnp.where(matched[:, None, None], Rb[None],
                       jnp.eye(2, dtype=dtype))
    RR = (
        jnp.eye(max_nz, dtype=dtype)[:, None, :, None]
        * blocks[:, :, None, :]
    ).reshape(m2, m2)
    S = S + C + RR
    S = 0.5 * (S + S.T)

    # ---- gain panels.
    L = jnp.linalg.cholesky(S)
    W1_p = solve_triangular(L, PHt_p.T, lower=True).T * actf
    W1_m_local = solve_triangular(L, PHt_m.T, lower=True).T * actf
    u = solve_triangular(L, v.reshape(m2), lower=True)

    if panel_exchange == "allgather":
        W1_m = lax.all_gather(W1_m_local, axis, axis=0,
                              tiled=True)                  # (cap2, m2)
        fm_delta = jnp.matmul(W1_m, u, precision=_HI)
        Ppm_delta = jnp.matmul(W1_p, W1_m.T, precision=_HI)
    else:
        # Ring mode: only O(rows_local) pieces cross shards here; the big
        # panel circulates later via ppermute.
        W1_m = None
        fm_delta = lax.all_gather(
            jnp.matmul(W1_m_local, u, precision=_HI), axis, axis=0,
            tiled=True,
        )
        Ppm_delta = lax.all_gather(
            jnp.matmul(W1_p, W1_m_local.T, precision=_HI), axis, axis=1,
            tiled=True,
        )

    pose_upd = pose_pred + jnp.matmul(W1_p, u, precision=_HI)
    fm_upd = st.fm + fm_delta.reshape(cap, 2)
    P33_upd = P33_pred - jnp.matmul(W1_p, W1_p.T, precision=_HI)
    Ppm_upd = Ppm_pred - Ppm_delta

    # ---- augmentation panels (replicated math; map-coordinate one-hots).
    mi = new.astype(jnp.int32)
    r, bb = z[:, 0], z[:, 1]
    phi = pose_upd[2]
    s = jnp.sin(phi + bb)
    c = jnp.cos(phi + bb)

    pos = st.n + jnp.cumsum(mi) - mi
    slot_ok = new & (pos < cap)
    gcol = jnp.where(slot_ok, 2 * pos, cap2)
    gcols = jnp.stack([gcol, gcol + 1], axis=-1).reshape(-1)  # (m2,)
    Em = (gcols[:, None] == jnp.arange(cap2)[None, :]).astype(dtype)

    fslot = jnp.where(slot_ok, pos, cap)
    fm_new = fm_upd.at[fslot].set(
        jnp.stack([pose_upd[0] + r * c, pose_upd[1] + r * s], axis=-1),
        mode="drop",
    )

    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    Gv = jnp.stack(
        [jnp.stack([one, zero, -r * s], axis=-1),
         jnp.stack([zero, one, r * c], axis=-1)], axis=-2)
    Gz = jnp.stack(
        [jnp.stack([c, -r * s], axis=-1),
         jnp.stack([s, r * c], axis=-1)], axis=-2)

    # New pose-map cross columns (replicated scatter into Ppm).
    A_pose = jnp.einsum("nok,kl->nol", Gv, P33_upd, precision=_HI)
    Ppm_new = Ppm_upd.at[:, gcols].set(A_pose.reshape(-1, 3).T, mode="drop")

    A_map = jnp.einsum("nok,kd->nod", Gv, Ppm_upd, precision=_HI)
    A2 = A_map.reshape(m2, cap2)
    B = jnp.einsum("iok,kl,jpl->iojp", Gv, P33_upd, Gv, precision=_HI)
    D = jnp.einsum("iok,kl,ipl->iop", Gz, Rb, Gz, precision=_HI)
    B = B + jnp.eye(max_nz, dtype=dtype)[:, None, :, None] * D[:, :, None, :]
    A_aug = A2 + 0.5 * jnp.matmul(B.reshape(m2, m2), Em, precision=_HI)

    # ---- the per-shard rectangular rank-k application.
    rect = (rank_k_update_rect if use_pallas_for(rows_local)
            else rank_k_update_rect_ref)

    if panel_exchange == "allgather":
        Xm = jnp.concatenate([Em, W1_m.T], axis=0)        # (2*m2, cap2)
        Ym = jnp.concatenate([A_aug, -0.5 * W1_m.T], axis=0)
        Xr = lax.dynamic_slice(
            Xm, (jnp.zeros_like(row0), row0), (Xm.shape[0], rows_local)
        )
        Yr = lax.dynamic_slice(
            Ym, (jnp.zeros_like(row0), row0), (Ym.shape[0], rows_local)
        )
        Pmm_new = rect(st.Pmm, Xr, Yr, Xm, Ym)
    else:
        Pmm_new = _ring_panel_update(
            st.Pmm, W1_m_local, Em, A_aug, row0, rows_local, rect, axis
        )

    n_new = jnp.minimum(
        st.n + jnp.sum(mi, dtype=st.n.dtype), cap
    ).astype(st.n.dtype)
    return BlockEKFState(
        pose=pose_upd, fm=fm_new, Ppp=P33_upd, Ppm=Ppm_new,
        Pmm=Pmm_new, n=n_new,
    )
