"""Closed-loop EKF-SLAM simulation as a jitted `lax.scan`.

Behavioral spec: reference sim/ekfslam-sim.jl:49-143 (sim!).  The reference
runs a mutable Python-style while-loop at 40 Hz with a real-time throttle;
here the whole closed loop is one compiled program:

  * one *epoch* = `substeps_per_obs` control ticks (steer -> lap-restart ->
    vehicle step -> control noise -> EKF predict) with the EKF measurement
    update (observe -> associate -> update -> augment) fused into the final
    tick, exactly where the reference's `dtsum > dt_obs` check fires
    (ekfslam-sim.jl:105-123; the cadence is every NINTH tick — see
    tpuslam/config.py:SimConfig.substeps_per_obs for the Float64 quirk);
  * a full run = `lax.scan` over epochs; termination (waypoint course done,
    ekfslam-sim.jl:80) becomes an `active` mask — finished epochs are
    masked no-ops, keeping shapes static;
  * noise enters either as pregenerated arrays (oracle-parity mode: the
    NumPy oracle consumes the identical stream) or is drawn on-device from a
    threaded PRNG key (production/bench mode).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpuslam.assoc.nn import associate
from tpuslam.config import SimConfig
from tpuslam.core.geometry import initial_pose
from tpuslam.core.motion import steer, step_vehicle
from tpuslam.filters.ekf import (
    add_features,
    predict,
    predict_accumulate,
    predict_accumulator_init,
    update,
)
from tpuslam.filters.state import EKFState, make_ekf_state
from tpuslam.sim.sensors import add_control_noise, get_observations
from tpuslam.utils.tree import tree_select


class VehicleState(NamedTuple):
    """True vehicle state (ref src/common.jl:36-57, time-varying part)."""

    pose: jnp.ndarray        # (3,) true pose
    gamma: jnp.ndarray       # () target steering angle
    waypoint_id: jnp.ndarray  # () int32, 0-based; -1 = course finished
    nlaps: jnp.ndarray       # () int32 remaining laps


class SimState(NamedTuple):
    vehicle: VehicleState
    ekf: EKFState


class TickRecord(NamedTuple):
    """Per-tick telemetry (ref: track recording, ekfslam-sim.jl:126-128)."""

    true_pose: jnp.ndarray   # (3,)
    slam_pose: jnp.ndarray   # (3,)
    active: jnp.ndarray      # () bool — tick actually executed


def init_sim_state(cfg: SimConfig, waypoints, dtype=jnp.float32) -> SimState:
    """Ref ekfsim_setup (sim/ekfslam-sim.jl:17-45): vehicle at the first
    waypoint heading for the second; EKF at the true pose, zero covariance."""
    pose = initial_pose(jnp.asarray(waypoints, dtype))
    vehicle = VehicleState(
        pose=pose,
        gamma=jnp.zeros((), dtype),
        waypoint_id=jnp.zeros((), jnp.int32),
        nlaps=jnp.asarray(cfg.nlaps, jnp.int32),
    )
    return SimState(vehicle=vehicle, ekf=make_ekf_state(pose, cfg.capacity, dtype))


def vehicle_tick(cfg: SimConfig, waypoints, veh: VehicleState, ctrl_noise):
    """Ground-truth half of a 40 Hz control step: steer -> lap restart ->
    vehicle motion (target controls) -> control noise.

    Returns (new_vehicle, measured_speed, measured_gamma, active).  Shared by
    the dense and sharded sim paths (the EKF predict differs between them).
    """
    active = veh.waypoint_id != -1

    gamma, iwp = steer(
        veh.pose, veh.gamma, veh.waypoint_id, waypoints,
        cfg.d_min, cfg.dt, cfg.vehicle.steer_rate, cfg.vehicle.max_gamma,
    )

    # Lap restart (ref ekfslam-sim.jl:88-92).
    restart = (iwp == -1) & (veh.nlaps > 1)
    iwp = jnp.where(restart, 0, iwp)
    nlaps = jnp.where(restart, veh.nlaps - 1, veh.nlaps)

    pose = step_vehicle(
        veh.pose, cfg.vehicle.target_speed, gamma, cfg.vehicle.wheelbase, cfg.dt
    )
    v_m, g_m = add_control_noise(cfg.vehicle.target_speed, gamma, ctrl_noise)
    return VehicleState(pose, gamma, iwp, nlaps), v_m, g_m, active


def control_tick(cfg: SimConfig, waypoints, st: SimState, ctrl_noise):
    """One 40 Hz control step (ref ekfslam-sim.jl:85-103).

    Order: steer -> lap restart -> vehicle motion (target controls) ->
    control noise -> EKF predict (measured controls).  A finished vehicle
    (waypoint_id == -1 at tick start) is a masked no-op.
    """
    veh, v_m, g_m, active = vehicle_tick(cfg, waypoints, st.vehicle, ctrl_noise)
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, st.ekf.x.dtype))
    ekf = predict(st.ekf, v_m, g_m, cfg.vehicle.wheelbase, Q, cfg.dt)

    out = tree_select(active, SimState(veh, ekf), st)
    rec = TickRecord(
        true_pose=out.vehicle.pose, slam_pose=out.ekf.x[:3], active=active
    )
    return out, rec


def observation_step(cfg: SimConfig, landmarks, st: SimState, obs_noise, active):
    """EKF measurement step (ref ekfslam-sim.jl:105-123): observe the true
    pose, associate, batched update, augment with new features."""
    R = jnp.diag(jnp.asarray(cfg.noise.R, st.ekf.x.dtype))
    z, z_mask, _ = get_observations(
        st.vehicle.pose, landmarks, cfg.vehicle.sensor_range,
        obs_noise, cfg.max_obs,
    )
    idf, matched, new = associate(
        st.ekf, z, z_mask, R, cfg.gate_assoc, cfg.gate_newfeat
    )
    ekf = update(st.ekf, z, matched, idf, R)
    ekf = add_features(ekf, z, new, R)
    return tree_select(active, SimState(st.vehicle, ekf), st)


def epoch(cfg: SimConfig, waypoints, landmarks, st: SimState, noises):
    """`substeps_per_obs` control ticks with the measurement update fused
    into the last one (where the reference's dtsum check fires).

    Fully fused covariance path: the per-tick time updates are accumulated
    (filters.ekf.predict_accumulate), association runs on the predicted
    state via closed-form small blocks, and predict + Kalman downdate +
    augmentation land on P as ONE symmetric rank-k update
    (filters.ekf_fused) — the covariance is streamed ~3x per epoch instead
    of ~30x.  Algebraically exact; equivalence with the modular per-tick
    path and the NumPy oracle is asserted in the test suite."""
    from tpuslam.assoc.nn import decide, pair_scores
    from tpuslam.filters.ekf_fused import (
        fused_epoch_apply,
        predicted_assoc_blocks,
    )

    ctrl_noise, obs_noise = noises  # (substeps, 2), (n_landmarks, 2)
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, st.ekf.x.dtype))

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

    acc0 = predict_accumulator_init(st.ekf.x[:3])
    (veh, (pose_pred, Gt, Qacc)), recs = lax.scan(
        tick, (st.vehicle, acc0), ctrl_noise, unroll=cfg.tick_unroll
    )
    # Activity at the START of the final tick gates the measurement step
    # (the reference's while-loop would have exited otherwise).
    tick9_active = recs.active[-1]

    R = jnp.diag(jnp.asarray(cfg.noise.R, st.ekf.x.dtype))
    z, z_mask, _ = get_observations(
        veh.pose, landmarks, cfg.vehicle.sensor_range, obs_noise, cfg.max_obs
    )
    # Association against the predicted state (small closed-form blocks).
    P33p, P3fp, Pff = predicted_assoc_blocks(st.ekf, Gt, Qacc)
    slot_active = jnp.arange(st.ekf.capacity) < st.ekf.n
    nis, nd = pair_scores(
        pose_pred, st.ekf.features, P33p, P3fp, Pff, z, z_mask, slot_active, R
    )
    idf, matched, new = decide(nis, nd, z_mask, cfg.gate_assoc,
                               cfg.gate_newfeat)

    ekf = fused_epoch_apply(
        st.ekf, pose_pred, Gt, Qacc, z, matched, new, idf, R, tick9_active
    )
    st = SimState(veh, ekf)
    # Tick-9 track entry records the POST-update SLAM pose (the reference
    # records after the update block, ekfslam-sim.jl:126-128).
    recs = TickRecord(
        true_pose=recs.true_pose,
        slam_pose=recs.slam_pose.at[-1].set(ekf.x[:3]),
        active=recs.active,
    )
    return st, recs


@functools.partial(jax.jit, static_argnums=(0,))
def run_epochs(cfg: SimConfig, waypoints, landmarks, st0: SimState, noises):
    """Oracle-parity mode: scan over epochs consuming pregenerated noise.

    noises = (ctrl: (E, substeps, 2), obs: (E, n_landmarks, 2)) — already
    scaled by the respective sigmas.

    Returns (final_state, records) with records stacked (E, substeps, ...).
    """
    return lax.scan(
        lambda s, nz: epoch(cfg, waypoints, landmarks, s, nz), st0, noises
    )


@functools.partial(jax.jit, static_argnums=(0, 4))
def run_epochs_rng(cfg: SimConfig, waypoints, landmarks, st0: SimState,
                   n_epochs: int, key):
    """Production/bench mode: noise drawn on-device inside the scan."""
    n_lm = landmarks.shape[0]
    dtype = st0.ekf.x.dtype
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
        st, recs = epoch(cfg, waypoints, landmarks, st, (ctrl, obs))
        return (st, k), recs

    (st, _), recs = lax.scan(body, (st0, key), None, length=n_epochs)
    return st, recs


def draw_noise_arrays(cfg: SimConfig, n_epochs: int, n_landmarks: int,
                      seed: int = 0):
    """Host-side pregenerated noise stream shared with the NumPy oracle."""
    rng = np.random.default_rng(seed)
    ctrl = rng.standard_normal((n_epochs, cfg.substeps_per_obs, 2))
    ctrl *= np.array([cfg.noise.sigma_speed, cfg.noise.sigma_steer])
    obs = rng.standard_normal((n_epochs, n_landmarks, 2))
    obs *= np.array([cfg.noise.sigma_range, cfg.noise.sigma_bearing])
    return ctrl, obs
