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
from tpuslam.parallel.ekf_sharded import (  # noqa: F401  (re-export)
    BlockEKFState,
    local_diag_blocks,
)

_HI = lax.Precision.HIGHEST

# Unit roundoff of bfloat16 (8-bit mantissa): |fl(x) - x| <= u |x|.
BF16_UNIT_ROUNDOFF = 2.0 ** -9


def psd_repair_local(Pmm, *, axis: str = "map", scale: float = 8.0,
                     rho: float | None = None):
    """Periodic PSD repair for reduced-precision Pmm storage (runs inside
    shard_map on the local row block).

    Rounding every write of Pmm to bf16/fp16 perturbs a matrix whose PSD
    margin the Kalman downdate drives toward zero (tight posterior
    correlations: |P_ij| -> sqrt(P_ii P_jj)); once u|P_ij| exceeds that
    margin the stored covariance goes indefinite, and the negative mode is
    then AMPLIFIED by subsequent updates (measured: min-eig -1e-4 at epoch
    ~15 doubling every ~2 epochs to Cholesky NaN at ~45, cap 1024 bf16 —
    see PERF.md).  Repair enforces two invariants every true covariance
    satisfies, in one cheap pass over the local block:

      1. diagonal floor:  P_ii <- max(P_ii, 0) + scale * u * sum_j |P_ij|
         (Gershgorin bound of the rounding perturbation, admitted as
         landmark process noise — strictly conservative);
      2. (rho != None) Cauchy-Schwarz clamp: |P_ij| <= rho sqrt(P_ii P_jj).
         OFF by default: measured HARMFUL on the 1k-landmark course (ATE
         2.1 -> 9.0 at fp16) — true SLAM correlations approach 1, so the
         clamp repeatedly injects decorrelation error larger than the
         quantization it guards against.  Kept as an option for workloads
         with weaker correlations.

    Measured outcome (240-epoch 1k-landmark course, repair every 16 +
    the S-Cholesky retry ladder): fp16 storage (u = 2^-11) tracks the f32
    run (ATE 2.1 vs 1.9); bf16 (u = 2^-9) stays finite but diverges —
    bf16's quantization exceeds the posterior PSD margin, a documented
    negative result (PERF.md).  Collective cost: ONE all_gather of the
    (2cap,) repaired diagonal per repair (only when rho is set), amortized
    over `repair_every` epochs.
    """
    rows_local, cap2 = Pmm.shape
    u = BF16_UNIT_ROUNDOFF if Pmm.dtype == jnp.bfloat16 else float(
        jnp.finfo(Pmm.dtype).eps) / 2
    Pf = Pmm.astype(jnp.float32)
    # Self-heal: zero any non-finite entries (fp16 overflow) so poison
    # lives at most `repair_every` epochs; the S-ladder skips updates in
    # the meantime (fused_epoch_apply_shard).
    Pf = jnp.where(jnp.isfinite(Pf), Pf, 0.0)
    row0 = lax.axis_index(axis) * rows_local
    on_diag = (jnp.arange(cap2)[None, :]
               == (row0 + jnp.arange(rows_local))[:, None])

    d_loc = jnp.sum(Pf * on_diag, axis=1)                # (rows_local,)
    rowsum = jnp.sum(jnp.abs(Pf), axis=1)
    d_new = jnp.maximum(d_loc, 0.0) + (scale * u) * rowsum

    if rho is not None:
        d_glob = lax.all_gather(d_new, axis, tiled=True)  # (cap2,)
        bound = rho * jnp.sqrt(
            jnp.maximum(d_new, 0.0)[:, None]
            * jnp.maximum(d_glob, 0.0)[None, :]
        )
        Pf = jnp.clip(Pf, -bound, bound)
    out = jnp.where(on_diag, d_new[:, None], Pf)
    return out.astype(Pmm.dtype)


def _pmm_matmul(Pmm, B, dtype):
    """Pmm @ B with the Pmm operand streamed at its STORAGE dtype (bf16 map
    blocks must not round-trip through an f32 copy); accumulation in
    `dtype`.  When storage == compute this is one of the two dim^2-sized
    products of the epoch, so it follows the big-matmul precision policy
    (kernels/dispatch.big_matmul_precision)."""
    if Pmm.dtype == dtype:
        from tpuslam.kernels.dispatch import big_matmul_precision

        return jnp.matmul(Pmm, B,
                          precision=big_matmul_precision(Pmm.shape[1]))
    return lax.dot_general(
        Pmm, B.astype(Pmm.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    )


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
    Pff = local_diag_blocks(st.Pmm, f0, st.pose.dtype)

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
    # Feature reads/placements go through one-hot matmuls and dense-H
    # panels — NO data-dependent gathers (degenerate lowering inside
    # shard_map on TPU; same lesson as filters/ekf.py's dense-H note).
    Eidf = (idf[:, None] == jnp.arange(cap)[None, :]).astype(dtype)
    feats = jnp.matmul(Eidf, st.fm, precision=_HI)           # (max_nz, 2)
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

    # Dense map-column observation Jacobian (m2, cap2): Hf blocks placed at
    # their feature columns by broadcasted one-hot.
    colsm = jnp.arange(cap2)
    is_f0 = (colsm[None, :] == fcol[:, None]).astype(dtype)
    is_f1 = (colsm[None, :] == (fcol + 1)[:, None]).astype(dtype)
    Hdm = (Hf[:, :, 0:1] * is_f0[:, None, :]
           + Hf[:, :, 1:2] * is_f1[:, None, :]).reshape(m2, cap2)
    Hp2 = Hp.reshape(m2, 3)

    # ---- PHt pose rows (replicated) and map rows (local): pure matmuls.
    PHt_p = (jnp.matmul(P33_pred, Hp2.T, precision=_HI)
             + jnp.matmul(Ppm_pred, Hdm.T, precision=_HI))   # (3, m2)

    Pmp_local = lax.dynamic_slice(
        Ppm_pred, (jnp.zeros_like(row0), row0), (3, rows_local)
    ).T
    PHt_m = (jnp.matmul(Pmp_local, Hp2.T, precision=_HI)
             + _pmm_matmul(st.Pmm, Hdm.T, dtype))            # (rows_local, m2)

    # ---- Schur system (ONE psum): the map-side quadratic form decomposes
    # over column blocks, C = sum_b Hdm[:, rows_b] @ PHt_m_b — each shard's
    # Hdm slice is nonzero only for the features it owns.
    Hdm_local = lax.dynamic_slice(
        Hdm, (jnp.zeros_like(row0), row0), (m2, rows_local)
    )
    C_b = jnp.matmul(Hdm_local, PHt_m, precision=_HI)
    C = lax.psum(C_b, axis)

    S = jnp.matmul(Hp2, PHt_p, precision=_HI)
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
    if st.Pmm.dtype == dtype:
        # Full-precision storage: plain Cholesky (exact-equivalence path).
        L = jnp.linalg.cholesky(S)
    else:
        # Reduced-precision map storage: Pmm carries relative quantization
        # noise u (2^-9 bf16 / 2^-11 fp16), which enters S through the map
        # contribution C = Hdm Pmm Hdm' and can tip S non-PD when the true
        # PSD margin is small (tight posterior correlations).  Escalating
        # jitter ladder sized from C's own quantization bound (ADVICE r1:
        # Cholesky-failure retry instead of one unconditional inflation):
        # try progressively larger diagonal inflations; if even the
        # largest fails, SKIP this epoch's measurement update entirely
        # (prediction-only epoch — always a valid filter step).  Pmm's own
        # accumulating indefiniteness is separately bounded by the
        # periodic psd_repair_local pass (sim_sharded.repair_every).
        u_q = BF16_UNIT_ROUNDOFF
        Dq = jnp.diag(jnp.abs(jnp.diag(C)))
        mq = jnp.mean(jnp.abs(jnp.diag(C))) * jnp.eye(m2, dtype=dtype)
        ladder = [
            (8.0 * u_q, 0.0),
            (2.0 ** -2, 2.0 ** -6),
            (1.0, 2.0 ** -2),
        ]
        Ls = [jnp.linalg.cholesky(S + a * Dq + b * mq) for a, b in ladder]
        oks = [jnp.isfinite(Lk).all() for Lk in Ls]
        L = Ls[-1]
        for Lk, okk in zip(reversed(Ls[:-1]), reversed(oks[:-1])):
            L = jnp.where(okk, Lk, L)
        any_ok = oks[0] | oks[1] | oks[2]
        # Sanitize so downstream solves stay finite; gains are zeroed.
        L = jnp.where(any_ok, L, jnp.eye(m2, dtype=dtype))
        actf = actf * any_ok.astype(dtype)

    # Small explicit triangular inverse, applied by matmul (ref ekf.jl:70-71
    # formulation; same rationale as filters/ekf_fused.py — a dim-sized
    # triangular-solve RHS serializes on TPU, the matmul rides the MXU).
    Linv = solve_triangular(L, jnp.eye(m2, dtype=dtype), lower=True)
    W1_p = jnp.matmul(PHt_p, Linv.T, precision=_HI) * actf
    W1_m_local = jnp.matmul(PHt_m, Linv.T, precision=_HI) * actf
    u = jnp.matmul(Linv, v.reshape(m2), precision=_HI) * actf

    if st.Pmm.dtype != dtype:
        # Self-healing guard: a poisoned Pmm entry (fp16 overflow -> inf,
        # or NaN in a row not observed this epoch, which S cannot see)
        # must not spread into the full-precision fm/Ppm/pose blocks.
        # Non-finite gain rows become no-ops; Pmm itself is cleaned by the
        # next psd_repair_local pass.
        W1_m_local = jnp.where(jnp.isfinite(W1_m_local), W1_m_local, 0.0)
        W1_p = jnp.where(jnp.isfinite(W1_p), W1_p, 0.0)

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

    # Feature-mean write as a one-hot blend (no dynamic scatter).
    fslot = jnp.where(slot_ok, pos, cap)
    Ef = (fslot[:, None] == jnp.arange(cap)[None, :]).astype(dtype)
    vals = jnp.stack([pose_upd[0] + r * c, pose_upd[1] + r * s], axis=-1)
    fm_new = (fm_upd * (1.0 - Ef.sum(0))[:, None]
              + jnp.matmul(Ef.T, vals * new[:, None], precision=_HI))

    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    Gv = jnp.stack(
        [jnp.stack([one, zero, -r * s], axis=-1),
         jnp.stack([zero, one, r * c], axis=-1)], axis=-2)
    Gz = jnp.stack(
        [jnp.stack([c, -r * s], axis=-1),
         jnp.stack([s, r * c], axis=-1)], axis=-2)
    Gv2 = Gv.reshape(m2, 3)

    # New pose-map cross columns: one-hot column blend into Ppm.
    A_pose = jnp.matmul(Gv2, P33_upd, precision=_HI)         # (m2, 3)
    colmask = Em.sum(0)                                      # (cap2,)
    Ppm_new = (Ppm_upd * (1.0 - colmask)[None, :]
               + jnp.matmul(A_pose.T, Em, precision=_HI))

    A2 = jnp.matmul(Gv2, Ppm_upd, precision=_HI)             # (m2, cap2)
    B = jnp.einsum("iok,kl,jpl->iojp", Gv, P33_upd, Gv, precision=_HI)
    D = jnp.einsum("iok,kl,ipl->iop", Gz, Rb, Gz, precision=_HI)
    B = B + jnp.eye(max_nz, dtype=dtype)[:, None, :, None] * D[:, :, None, :]
    A_aug = A2 + 0.5 * jnp.matmul(B.reshape(m2, m2), Em, precision=_HI)

    # ---- the per-shard rectangular rank-k application.  Dispatch on the
    # block's larger side (cap2): the Pallas win is about streaming volume
    # + in-place aliasing, which the (rows_local, cap2) rect shares with
    # the square kernel the threshold was measured on.
    rect = (rank_k_update_rect
            if use_pallas_for(max(rows_local, cap2), "rank_k",
                              dtype=st.Pmm.dtype)
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
