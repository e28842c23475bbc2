"""Closed-loop EKF-SLAM with the map sharded over the mesh: the full
sim!-equivalent epoch scan (sim/ekfslam-sim.jl:49-143) running inside one
shard_map, so the Schur-reduction collectives of every update ride the mesh
interconnect while the vehicle/sensor side stays replicated.

Structure mirrors tpuslam.sim.simulator exactly; equivalence with the dense
single-chip engine is asserted in tests/test_sim_sharded.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tpuslam.assoc.nn import decide, pair_scores
from tpuslam.config import SimConfig
from tpuslam.parallel.ekf_sharded import (
    BlockEKFState,
    add_features_shard,
    local_diag_blocks,
    predict_shard,
    state_specs,
    update_shard,
)
from tpuslam.sim.sensors import get_observations
from tpuslam.sim.simulator import (
    TickRecord,
    VehicleState,
    init_sim_state,
    vehicle_tick,
)
from tpuslam.utils.tree import tree_select


class ShardedSimState(NamedTuple):
    vehicle: VehicleState   # replicated
    ekf: BlockEKFState      # Pmm row-sharded over 'map'


def sim_state_specs(axis: str = "map") -> ShardedSimState:
    return ShardedSimState(
        vehicle=VehicleState(P(), P(), P(), P()),
        ekf=state_specs(axis),
    )


def init_sharded_sim_state(cfg: SimConfig, waypoints, dtype=jnp.float32,
                           map_dtype=None):
    """`map_dtype` (e.g. jnp.bfloat16) selects the STORAGE dtype of the
    row-sharded landmark-landmark block Pmm; all algebra still runs in
    `dtype` (tiles stream at storage dtype, accumulate in `dtype`, round
    on write).  Halves the dominant memory term: at 100k landmarks Pmm is
    160 GB in f32 vs 80 GB in bf16.

    CAVEAT — bounded horizon.  Rounding every Pmm write to bf16 perturbs a
    matrix that the Kalman downdate drives toward singularity; the
    perturbation's most-negative eigenvalue scales with the number of
    correlated entries per row (Gershgorin), so the covariance eventually
    goes indefinite and the update Cholesky NaNs — measured at ~55 epochs
    on a 1k-landmark course (cap 1024) regardless of the S-jitter guard.
    Use for bounded windows (checkpoint + re-project to f32 to reset), or
    keep f32 storage for long runs: 100k landmarks in f32 fits one v5p
    host (8 x 95 GB) — see PERF.md.  Validated-horizon equivalence test:
    tests/test_sim_sharded.py::test_sharded_run_bf16_map_storage."""
    from tpuslam.parallel.ekf_sharded import from_dense

    st = init_sim_state(cfg, waypoints, dtype)
    ekf = from_dense(st.ekf)
    if map_dtype is not None:
        ekf = ekf._replace(Pmm=ekf.Pmm.astype(map_dtype))
    return ShardedSimState(vehicle=st.vehicle, ekf=ekf)


def associate_shard(st: BlockEKFState, z, z_mask, R, gate1, gate2,
                    *, axis: str = "map"):
    """Gated NN association over the sharded state.

    Each shard scores the (obs x local-slot) pairs from the covariance
    blocks it owns (Pff diag blocks live in its Pmm rows), then one
    all_gather of the (max_nz, cap_local) score panel replicates the full
    score matrix and the decision logic runs replicated — identical
    semantics to the single-chip path (assoc/nn.py)."""
    rows_local = st.Pmm.shape[0]
    cap_local = rows_local // 2
    b = lax.axis_index(axis)
    f0 = b * cap_local
    row0 = b * rows_local

    feats_local = lax.dynamic_slice(
        st.fm, (f0, jnp.zeros_like(f0)), (cap_local, 2)
    )
    # Pose-feature blocks from the replicated Ppm, sliced to our columns.
    P3f = lax.dynamic_slice(
        st.Ppm, (jnp.zeros_like(row0), row0), (3, rows_local)
    ).reshape(3, cap_local, 2).transpose(1, 0, 2)          # (cap_local, 3, 2)
    # Feature 2x2 diag blocks from our Pmm rows (no dynamic-index gather,
    # see ekf_sharded.local_diag_blocks).
    Pff = local_diag_blocks(
        st.Pmm, f0, st.pose.dtype
    )                                                       # (cap_local, 2, 2)

    slot_active = (f0 + jnp.arange(cap_local)) < st.n
    nis_l, nd_l = pair_scores(
        st.pose, feats_local, st.Ppp, P3f, Pff, z, z_mask, slot_active, R
    )
    # One all_gather replicates the full (max_nz, cap) score matrices.
    scores = lax.all_gather(
        jnp.stack([nis_l, nd_l]), axis, axis=2, tiled=True
    )
    return decide(scores[0], scores[1], z_mask, gate1, gate2)


def observation_step_shard(cfg: SimConfig, landmarks, st: ShardedSimState,
                           obs_noise, active, *, axis: str = "map"):
    """Sharded mirror of sim.simulator.observation_step."""
    dtype = st.ekf.pose.dtype
    R = jnp.diag(jnp.asarray(cfg.noise.R, dtype))
    z, z_mask, _ = get_observations(
        st.vehicle.pose, landmarks, cfg.vehicle.sensor_range,
        obs_noise, cfg.max_obs,
    )
    idf, matched, new = associate_shard(
        st.ekf, z, z_mask, R, cfg.gate_assoc, cfg.gate_newfeat, axis=axis
    )
    ekf = update_shard(st.ekf, z, matched, idf, R, axis=axis)
    ekf = add_features_shard(ekf, z, new, R, axis=axis)
    return tree_select(active, ShardedSimState(st.vehicle, ekf), st)


def control_tick_shard(cfg: SimConfig, waypoints, st: ShardedSimState,
                       ctrl_noise):
    veh, v_m, g_m, active = vehicle_tick(cfg, waypoints, st.vehicle, ctrl_noise)
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, st.ekf.pose.dtype))
    ekf = predict_shard(st.ekf, v_m, g_m, cfg.vehicle.wheelbase, Q, cfg.dt)
    out = tree_select(active, ShardedSimState(veh, ekf), st)
    rec = TickRecord(
        true_pose=out.vehicle.pose, slam_pose=out.ekf.pose, active=active
    )
    return out, rec


def epoch_shard(cfg: SimConfig, waypoints, landmarks, st, noises,
                *, axis: str = "map", panel_exchange: str = "allgather"):
    """Fused-epoch sharded observation cycle (mirrors sim.simulator.epoch):
    accumulated predict + association on the predicted state + one
    rectangular rank-k application to the local Pmm block
    (parallel/ekf_fused_sharded.py)."""
    from tpuslam.filters.ekf import (
        predict_accumulate,
        predict_accumulator_init,
    )
    from tpuslam.parallel.ekf_fused_sharded import (
        associate_pred_shard,
        fused_epoch_apply_shard,
    )

    ctrl_noise, obs_noise = noises
    dtype = st.ekf.pose.dtype
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, dtype))

    def tick(carry, nz):
        veh, acc = carry
        veh2, v_m, g_m, active = vehicle_tick(cfg, waypoints, veh, nz)
        acc2 = predict_accumulate(
            acc, v_m, g_m, cfg.vehicle.wheelbase, Q, cfg.dt
        )
        veh_out, acc_out = tree_select(active, (veh2, acc2), (veh, acc))
        rec = TickRecord(
            true_pose=veh_out.pose, slam_pose=acc_out[0], active=active
        )
        return (veh_out, acc_out), rec

    acc0 = predict_accumulator_init(st.ekf.pose)
    (veh, (pose_pred, Gt, Qacc)), recs = lax.scan(
        tick, (st.vehicle, acc0), ctrl_noise, unroll=cfg.tick_unroll
    )
    tick9_active = recs.active[-1]

    R = jnp.diag(jnp.asarray(cfg.noise.R, dtype))
    z, z_mask, _ = get_observations(
        veh.pose, landmarks, cfg.vehicle.sensor_range, obs_noise, cfg.max_obs
    )
    idf, matched, new = associate_pred_shard(
        st.ekf, pose_pred, Gt, Qacc, z, z_mask, R,
        cfg.gate_assoc, cfg.gate_newfeat, axis=axis,
    )
    ekf = fused_epoch_apply_shard(
        st.ekf, pose_pred, Gt, Qacc, z, matched, new, idf, R, tick9_active,
        axis=axis, panel_exchange=panel_exchange,
    )
    st = ShardedSimState(veh, ekf)
    recs = TickRecord(
        true_pose=recs.true_pose,
        slam_pose=recs.slam_pose.at[-1].set(ekf.pose),
        active=recs.active,
    )
    return st, recs


def _maybe_repair(st: ShardedSimState, e, repair_every, axis: str):
    """Periodic PSD repair of reduced-precision Pmm storage (trace-time
    no-op for full-precision storage) — see ekf_fused_sharded.psd_repair_local
    for the bound.  `repair_every=None` selects the default (32 epochs for
    reduced-precision storage, off otherwise); 0 disables."""
    from tpuslam.parallel.ekf_fused_sharded import psd_repair_local

    reduced = st.ekf.Pmm.dtype != st.ekf.pose.dtype
    if repair_every is None:
        # Default cadence measured on the 220-epoch 1k-landmark course
        # (fp16 storage): every-4 -> ATE 1.35 m (f32 run: 1.88), every-8 ->
        # 4.1, every-16 -> 6.1.  Cost: one extra pass over Pmm per 4
        # epochs ~= +8% of the epoch's 3-pass covariance traffic.
        repair_every = 4 if reduced else 0
    if not repair_every or not reduced:
        return st

    def rep(s):
        return s._replace(ekf=s.ekf._replace(
            Pmm=psd_repair_local(s.ekf.Pmm, axis=axis)
        ))

    return lax.cond(
        (e % repair_every) == repair_every - 1, rep, lambda s: s, st
    )


def make_sharded_run(cfg: SimConfig, mesh, axis: str = "map",
                     panel_exchange: str = "allgather",
                     repair_every: int | None = None):
    """Whole-run scan (array-noise mode) inside one shard_map."""
    sp = sim_state_specs(axis)

    def run(waypoints, landmarks, st0, noises):
        n_epochs = noises[0].shape[0]

        def body(s, enz):
            e, nz = enz
            s, recs = epoch_shard(cfg, waypoints, landmarks, s, nz,
                                  axis=axis, panel_exchange=panel_exchange)
            return _maybe_repair(s, e, repair_every, axis), recs

        return lax.scan(body, st0, (jnp.arange(n_epochs), noises))

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(), sp, P()),
            out_specs=(sp, P()),
            check_vma=False,
        )
    )


def make_sharded_run_rng(cfg: SimConfig, mesh, n_epochs: int,
                         axis: str = "map",
                         panel_exchange: str = "allgather",
                         repair_every: int | None = None):
    """Whole-run scan with on-device noise (production/bench mode)."""
    sp = sim_state_specs(axis)

    def run(waypoints, landmarks, st0, key):
        n_lm = landmarks.shape[0]
        dtype = st0.ekf.pose.dtype
        sig_ctrl = jnp.asarray(
            [cfg.noise.sigma_speed, cfg.noise.sigma_steer], dtype)
        sig_obs = jnp.asarray(
            [cfg.noise.sigma_range, cfg.noise.sigma_bearing], dtype)

        def body(carry, e):
            st, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            ctrl = jax.random.normal(
                k1, (cfg.substeps_per_obs, 2), dtype) * sig_ctrl
            obs = jax.random.normal(k2, (n_lm, 2), dtype) * sig_obs
            st, recs = epoch_shard(cfg, waypoints, landmarks, st,
                                   (ctrl, obs), axis=axis,
                                   panel_exchange=panel_exchange)
            return (_maybe_repair(st, e, repair_every, axis), k), recs

        (st, _), recs = lax.scan(body, (st0, key), jnp.arange(n_epochs))
        return st, recs

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(), sp, P()),
            out_specs=(sp, P()),
            check_vma=False,
        )
    )
