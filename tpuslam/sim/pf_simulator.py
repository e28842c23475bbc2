"""Closed-loop FastSLAM simulation (mirrors sim/simulator.py with the
Rao-Blackwellized particle filter in place of the joint EKF).

Inherently stochastic (per-particle proposal sampling), so there is no
deterministic oracle parity; validation is statistical (ATE bound, weight
normalization, Neff behavior — tests/test_fastslam.py)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpuslam.config import SimConfig
from tpuslam.filters.fastslam import (
    PFState,
    estimate_pose,
    maintain_maps,
    make_pf_state,
    maybe_resample,
    measurement_update,
    predict_particles,
)
from tpuslam.sim.sensors import get_observations
from tpuslam.sim.simulator import TickRecord, VehicleState, vehicle_tick
from tpuslam.core.geometry import initial_pose
from tpuslam.utils.tree import tree_select


class PFSimState(NamedTuple):
    vehicle: VehicleState
    pf: PFState
    key: jnp.ndarray


def init_pf_sim_state(cfg: SimConfig, waypoints, n_particles: int, key,
                      dtype=jnp.float32) -> PFSimState:
    pose = initial_pose(jnp.asarray(waypoints, dtype))
    vehicle = VehicleState(
        pose=pose,
        gamma=jnp.zeros((), dtype),
        waypoint_id=jnp.zeros((), jnp.int32),
        nlaps=jnp.asarray(cfg.nlaps, jnp.int32),
    )
    return PFSimState(
        vehicle=vehicle,
        pf=make_pf_state(pose, n_particles, cfg.capacity, dtype),
        key=key,
    )


def pf_control_tick(cfg: SimConfig, waypoints, st: PFSimState, ctrl_noise):
    veh, v_m, g_m, active = vehicle_tick(cfg, waypoints, st.vehicle, ctrl_noise)
    key, kp = jax.random.split(st.key)
    dtype = st.pf.poses.dtype
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, dtype))
    # FastSLAM proposal samples fresh control noise per particle around the
    # *measured* controls (what the filter would be fed on a real vehicle).
    pf = predict_particles(
        st.pf, v_m, g_m, Q, cfg.vehicle.wheelbase, cfg.dt, kp
    )
    out = tree_select(active, PFSimState(veh, pf, key), st._replace(key=key))
    rec = TickRecord(
        true_pose=out.vehicle.pose,
        slam_pose=estimate_pose(out.pf),
        active=active,
    )
    return out, rec


def pf_observation_step(cfg: SimConfig, landmarks, st: PFSimState, obs_noise,
                        active):
    dtype = st.pf.poses.dtype
    R = jnp.diag(jnp.asarray(cfg.noise.R, dtype))
    z, z_mask, _ = get_observations(
        st.vehicle.pose, landmarks, cfg.vehicle.sensor_range,
        obs_noise, cfg.max_obs,
    )
    key, kr = jax.random.split(st.key)
    pf = measurement_update(
        st.pf, z, z_mask, R, cfg.gate_assoc, cfg.pf_gate_newfeat,
        sensor_range=cfg.vehicle.sensor_range,
        visibility_margin=cfg.pf_visibility_margin,
    )
    pf = maintain_maps(pf, cfg.pf_merge_radius, cfg.pf_prune_below)
    pf = maybe_resample(pf, kr)
    return tree_select(
        active, PFSimState(st.vehicle, pf, key), st._replace(key=key)
    )


def pf_epoch(cfg: SimConfig, waypoints, landmarks, st: PFSimState, noises):
    ctrl_noise, obs_noise = noises
    n_sub = cfg.substeps_per_obs
    st, recs = lax.scan(
        lambda s, nz: pf_control_tick(cfg, waypoints, s, nz),
        st, ctrl_noise[: n_sub - 1],
    )
    tick9_active = st.vehicle.waypoint_id != -1
    st, last_rec = pf_control_tick(cfg, waypoints, st, ctrl_noise[n_sub - 1])
    st = pf_observation_step(cfg, landmarks, st, obs_noise, tick9_active)
    last_rec = TickRecord(
        true_pose=st.vehicle.pose, slam_pose=estimate_pose(st.pf),
        active=last_rec.active,
    )
    recs = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b[None]], axis=0), recs, last_rec
    )
    return st, recs


@functools.partial(jax.jit, static_argnums=(0, 4))
def run_epochs_pf(cfg: SimConfig, waypoints, landmarks, st0: PFSimState,
                  n_epochs: int, key):
    """Full FastSLAM run, on-device noise (both sim truth and proposal)."""
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
        st, recs = pf_epoch(cfg, waypoints, landmarks, st, (ctrl, obs))
        return (st, k), recs

    (st, _), recs = lax.scan(body, (st0, key), None, length=n_epochs)
    return st, recs
