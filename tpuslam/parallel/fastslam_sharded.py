"""Particle-sharded FastSLAM (the data-parallel axis of the engine).

Particles shard over the 'particle' mesh axis; each shard runs the vmapped
per-particle pipeline (proposal, per-landmark 2x2 EKFs, weights) fully
locally.  Cross-shard exchange happens in exactly two places, both O(Np)
or O(particle state), never O(cap^2):

  * weight normalization / Neff / resampling decisions: ONE all_gather of
    the (Np,) log-weight vector (computed replicated so every shard takes
    identical decisions — a deterministic alternative to psum that also
    makes the sharded run bit-comparable to the single-chip run);
  * resampling: survivors are fetched with an all_gather of the particle
    state, gated behind the replicated resample decision via lax.cond so
    the gather is skipped on epochs that do not resample.

The proposal noise is drawn as the full (Np_total, 2) block and sliced per
shard (filters/fastslam.py:predict_particles n_total/offset), so a sharded
run consumes the SAME random stream as the single-chip run — asserted in
tests/test_fastslam_sharded.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tpuslam.config import SimConfig
from tpuslam.core.geometry import initial_pose
from tpuslam.filters.fastslam import (
    PFState,
    make_pf_state,
    predict_particles,
    systematic_resample_indices,
)
from tpuslam.sim.sensors import get_observations
from tpuslam.sim.simulator import TickRecord, VehicleState, vehicle_tick
from tpuslam.utils.tree import tree_select

AXIS = "particle"


class PFShardedSimState(NamedTuple):
    vehicle: VehicleState   # replicated
    pf: PFState             # all leaves sharded on leading particle axis
    key: jnp.ndarray        # replicated


def pf_sim_state_specs(axis: str = AXIS) -> PFShardedSimState:
    return PFShardedSimState(
        vehicle=VehicleState(P(), P(), P(), P()),
        pf=PFState(
            poses=P(axis), fm=P(axis), fP=P(axis), logw=P(axis), n=P(axis),
            cnt=P(axis),
        ),
        key=P(),
    )


def init_pf_sharded_sim_state(cfg: SimConfig, waypoints, n_particles: int,
                              key, dtype=jnp.float32) -> PFShardedSimState:
    pose = initial_pose(jnp.asarray(waypoints, dtype))
    vehicle = VehicleState(
        pose=pose,
        gamma=jnp.zeros((), dtype),
        waypoint_id=jnp.zeros((), jnp.int32),
        nlaps=jnp.asarray(cfg.nlaps, jnp.int32),
    )
    return PFShardedSimState(
        vehicle=vehicle,
        pf=make_pf_state(pose, n_particles, cfg.capacity, dtype),
        key=key,
    )


def _normalize_and_resample_shard(pf: PFState, key, threshold=0.5,
                                  *, axis: str = AXIS):
    """Replicated weight bookkeeping + cond-gated resampling exchange."""
    np_local = pf.poses.shape[0]
    nshards = lax.axis_size(axis)
    np_total = np_local * nshards
    b = lax.axis_index(axis)

    logw_all = lax.all_gather(pf.logw, axis, axis=0, tiled=True)  # (Np,)
    lse = jax.scipy.special.logsumexp(logw_all)
    logw_all = logw_all - lse
    logw_local = lax.dynamic_slice(logw_all, (b * np_local,), (np_local,))

    w = jnp.exp(logw_all)
    neff = 1.0 / jnp.sum(w * w)
    do = neff < threshold * np_total

    def resample(pf):
        idx = systematic_resample_indices(logw_all, key)      # (Np,) global
        my_idx = lax.dynamic_slice(idx, (b * np_local,), (np_local,))
        full = jax.tree.map(
            lambda a: lax.all_gather(a, axis, axis=0, tiled=True),
            (pf.poses, pf.fm, pf.fP, pf.n, pf.cnt),
        )
        poses, fm, fP, n, cnt = jax.tree.map(lambda a: a[my_idx], full)
        flat = jnp.full(
            (np_local,), -jnp.log(float(np_total)), pf.logw.dtype
        )
        return PFState(poses=poses, fm=fm, fP=fP, logw=flat, n=n, cnt=cnt)

    def keep(pf):
        return pf._replace(logw=logw_local)

    return lax.cond(do, resample, keep, pf)


def pf_control_tick_shard(cfg: SimConfig, waypoints, st: PFShardedSimState,
                          ctrl_noise, n_total: int, *, axis: str = AXIS):
    veh, v_m, g_m, active = vehicle_tick(cfg, waypoints, st.vehicle, ctrl_noise)
    key, kp = jax.random.split(st.key)
    dtype = st.pf.poses.dtype
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, dtype))
    np_local = st.pf.poses.shape[0]
    offset = lax.axis_index(axis) * np_local
    pf = predict_particles(
        st.pf, v_m, g_m, Q, cfg.vehicle.wheelbase, cfg.dt, kp,
        n_total=n_total, offset=offset,
    )
    out = tree_select(
        active, PFShardedSimState(veh, pf, key), st._replace(key=key)
    )
    rec = TickRecord(
        true_pose=out.vehicle.pose,
        slam_pose=_estimate_pose_shard(out.pf, axis=axis),
        active=active,
    )
    return out, rec


def _estimate_pose_shard(pf: PFState, *, axis: str = AXIS):
    """Weighted mean pose with the reductions psum'd over the mesh."""
    w = jnp.exp(pf.logw)  # logw kept globally normalized between epochs
    sums = lax.psum(
        jnp.stack(
            [
                jnp.sum(w * pf.poses[:, 0]),
                jnp.sum(w * pf.poses[:, 1]),
                jnp.sum(w * jnp.sin(pf.poses[:, 2])),
                jnp.sum(w * jnp.cos(pf.poses[:, 2])),
                jnp.sum(w),
            ]
        ),
        axis,
    )
    tot = sums[4]
    return jnp.stack(
        [sums[0] / tot, sums[1] / tot, jnp.arctan2(sums[2], sums[3])]
    )


def pf_observation_step_shard(cfg: SimConfig, landmarks,
                              st: PFShardedSimState, obs_noise, active,
                              *, axis: str = AXIS):
    dtype = st.pf.poses.dtype
    R = jnp.diag(jnp.asarray(cfg.noise.R, dtype))
    z, z_mask, _ = get_observations(
        st.vehicle.pose, landmarks, cfg.vehicle.sensor_range,
        obs_noise, cfg.max_obs,
    )
    key, kr = jax.random.split(st.key)
    # Local vmapped update WITHOUT the global normalization (that happens in
    # the replicated bookkeeping below): call the per-particle kernel
    # directly to keep weights un-normalized across shards.
    from tpuslam.filters.fastslam import _particle_measurement, maintain_maps

    fm, fP, n, cnt, dlogw = jax.vmap(
        lambda p, m, c, k, e: _particle_measurement(
            p, m, c, k, e, z, z_mask, R, cfg.gate_assoc,
            cfg.pf_gate_newfeat,
            cfg.vehicle.sensor_range, cfg.pf_visibility_margin,
        )
    )(st.pf.poses, st.pf.fm, st.pf.fP, st.pf.n, st.pf.cnt)
    pf = PFState(poses=st.pf.poses, fm=fm, fP=fP,
                 logw=st.pf.logw + dlogw, n=n, cnt=cnt)
    pf = maintain_maps(pf, cfg.pf_merge_radius, cfg.pf_prune_below)
    pf = _normalize_and_resample_shard(pf, kr, axis=axis)
    return tree_select(
        active, PFShardedSimState(st.vehicle, pf, key), st._replace(key=key)
    )


def pf_epoch_shard(cfg: SimConfig, waypoints, landmarks, st, noises,
                   n_total: int, *, axis: str = AXIS):
    ctrl_noise, obs_noise = noises
    n_sub = cfg.substeps_per_obs
    st, recs = lax.scan(
        lambda s, nz: pf_control_tick_shard(cfg, waypoints, s, nz, n_total,
                                            axis=axis),
        st, ctrl_noise[: n_sub - 1],
    )
    tick9_active = st.vehicle.waypoint_id != -1
    st, last_rec = pf_control_tick_shard(
        cfg, waypoints, st, ctrl_noise[n_sub - 1], n_total, axis=axis
    )
    st = pf_observation_step_shard(cfg, landmarks, st, obs_noise,
                                   tick9_active, axis=axis)
    last_rec = TickRecord(
        true_pose=st.vehicle.pose,
        slam_pose=_estimate_pose_shard(st.pf, axis=axis),
        active=last_rec.active,
    )
    recs = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b[None]], axis=0), recs, last_rec
    )
    return st, recs


def make_sharded_pf_run(cfg: SimConfig, mesh, n_epochs: int, n_total: int,
                        axis: str = AXIS):
    """Full particle-sharded FastSLAM run (on-device noise)."""
    sp = pf_sim_state_specs(axis)

    def run(waypoints, landmarks, st0, key):
        n_lm = landmarks.shape[0]
        dtype = st0.pf.poses.dtype
        sig_ctrl = jnp.asarray(
            [cfg.noise.sigma_speed, cfg.noise.sigma_steer], dtype)
        sig_obs = jnp.asarray(
            [cfg.noise.sigma_range, cfg.noise.sigma_bearing], dtype)

        def body(carry, _):
            st, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            ctrl = jax.random.normal(
                k1, (cfg.substeps_per_obs, 2), dtype) * sig_ctrl
            obs = jax.random.normal(k2, (n_lm, 2), dtype) * sig_obs
            st, recs = pf_epoch_shard(cfg, waypoints, landmarks, st,
                                      (ctrl, obs), n_total, axis=axis)
            return (st, k), recs

        (st, _), recs = lax.scan(body, (st0, key), None, length=n_epochs)
        return st, recs

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(), sp, P()),
            out_specs=(sp, P()),
            check_vma=False,
        )
    )
