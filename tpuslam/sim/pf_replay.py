"""Paired-platform FastSLAM replay — the chip-vs-CPU bias diagnostic
(VERDICT r4 task 3; PERF.md "FastSLAM accuracy", open finding).

The r4 12-seed study found a real statistical bias: every chip seed's
100-particle ATE exceeded every CPU seed's (p ~ 1/6188 under
exchangeability) despite a decision-identical per-step path.  But those
runs were NOT paired: the truth trajectory and observation stream are
generated on-device, so after the first ulp-level divergence the two
platforms run DIFFERENT noise realizations and single-seed comparisons
measure realization chaos, not platform effect.

This module removes the confound.  A `PFTape` — measured controls,
observations, truth poses, and the filter's per-tick PRNG keys, all as
plain arrays — is generated ONCE (host CPU), and `run_replay` advances
the pure filter recursion (predict / measurement / maintain / resample,
exactly the pf_simulator update order) against that tape on ANY
platform.  Two platforms replaying the same tape from the same initial
particle state see literally identical data and keys; only the
arithmetic differs.  Paired statistics over seeds and over
re-synchronized windows then localize where (and whether) the platform
distributions part.

Reference anchor: FastSLAM is the reference's declared-unfinished
component (src/common.jl:14-34); the closed-loop structure mirrored
here is sim/ekfslam-sim.jl:85-123 with the PF in place of the EKF.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpuslam.config import SimConfig
from tpuslam.filters.fastslam import (
    PFState,
    effective_sample_size,
    estimate_pose,
    maintain_maps,
    maybe_resample,
    measurement_update,
    predict_particles,
)
from tpuslam.sim.sensors import get_observations
from tpuslam.sim.simulator import vehicle_tick, VehicleState
from tpuslam.core.geometry import initial_pose
from tpuslam.utils.tree import tree_select


class PFTape(NamedTuple):
    """One closed-loop course as data: everything the filter consumes."""

    v_m: jnp.ndarray        # (E, S) measured speed per control tick
    g_m: jnp.ndarray        # (E, S) measured steer angle per tick
    active: jnp.ndarray     # (E, S) bool — course still running at tick
    z: jnp.ndarray          # (E, max_obs, 2) observation batch per epoch
    z_mask: jnp.ndarray     # (E, max_obs)
    true_pose: jnp.ndarray  # (E, 3) truth at the observation tick
    keys_p: jnp.ndarray     # (E, S, 2) uint32 — proposal key per tick
    keys_r: jnp.ndarray     # (E, 2) uint32 — resample key per epoch


@functools.partial(jax.jit, static_argnums=(0, 3))
def make_tape(cfg: SimConfig, waypoints, landmarks, n_epochs: int, key):
    """Generate the tape with run_epochs_pf's exact noise/key cadence
    (sim/pf_simulator.py): per epoch, one split into (carry, ctrl-noise,
    obs-noise) keys; per tick one filter-key split for the proposal; one
    more at the observation for resampling.  Runs wherever the caller's
    default device is — pin to CPU for the paired study."""
    dtype = jnp.float32
    n_lm = landmarks.shape[0]
    S = cfg.substeps_per_obs
    sig_ctrl = jnp.asarray(
        [cfg.noise.sigma_speed, cfg.noise.sigma_steer], dtype)
    sig_obs = jnp.asarray(
        [cfg.noise.sigma_range, cfg.noise.sigma_bearing], dtype)
    pose0 = initial_pose(jnp.asarray(waypoints, dtype))
    veh0 = VehicleState(
        pose=pose0, gamma=jnp.zeros((), dtype),
        waypoint_id=jnp.zeros((), jnp.int32),
        nlaps=jnp.asarray(cfg.nlaps, jnp.int32),
    )
    key, key_f = jax.random.split(key)

    def epoch(carry, _):
        veh, k, kf = carry
        k, k1, k2 = jax.random.split(k, 3)
        ctrl = jax.random.normal(k1, (S, 2), dtype) * sig_ctrl
        obs = jax.random.normal(k2, (n_lm, 2), dtype) * sig_obs

        def tick(c, nz):
            v, kf = c
            v2, v_m, g_m, act = vehicle_tick(cfg, waypoints, v, nz)
            kf, kp = jax.random.split(kf)
            v = tree_select(act, v2, v)
            return (v, kf), (v_m, g_m, act, jax.random.key_data(kp))

        (veh, kf), (v_m, g_m, act, kp) = lax.scan(
            tick, (veh, kf), ctrl)
        kf, kr = jax.random.split(kf)
        z, z_mask, _ = get_observations(
            veh.pose, landmarks, cfg.vehicle.sensor_range, obs,
            cfg.max_obs)
        # The observation fires only while the course runs (the tick-9
        # active semantics of pf_epoch); a masked-out epoch contributes
        # no observations and no state change on replay.
        z_mask = z_mask & act[S - 1]
        rec = PFTape(v_m=v_m, g_m=g_m, active=act, z=z, z_mask=z_mask,
                     true_pose=veh.pose, keys_p=kp,
                     keys_r=jax.random.key_data(kr))
        return (veh, k, kf), rec

    _, tape = lax.scan(epoch, (veh0, key, key_f), None, length=n_epochs)
    return tape


class ReplayRecord(NamedTuple):
    est_pose: jnp.ndarray   # (E, 3) weighted-mean pose after the update
    neff: jnp.ndarray       # (E,) effective sample size
    resampled: jnp.ndarray  # (E,) bool
    n_mean: jnp.ndarray     # (E,) mean active features per particle
    logw_max: jnp.ndarray   # (E,) max normalized log-weight


@functools.partial(jax.jit, static_argnums=(0,))
def run_replay(cfg: SimConfig, tape: PFTape, pf0: PFState):
    """Advance the pure filter recursion over the whole tape.  The
    update order per epoch matches pf_simulator.pf_epoch exactly:
    S proposal ticks, then measurement + maintenance + resampling."""
    dtype = pf0.poses.dtype
    Q = jnp.diag(jnp.asarray(cfg.noise.Q, dtype))
    R = jnp.diag(jnp.asarray(cfg.noise.R, dtype))
    S = cfg.substeps_per_obs

    def epoch(pf, t: PFTape):
        def tick(pf, tt):
            v_m, g_m, act, kp = tt
            pf2 = predict_particles(
                pf, v_m, g_m, Q, cfg.vehicle.wheelbase, cfg.dt,
                jax.random.wrap_key_data(kp))
            return tree_select(act, pf2, pf), None

        pf, _ = lax.scan(
            tick, pf, (t.v_m, t.g_m, t.active, t.keys_p))
        act = t.active[S - 1]
        pf2 = measurement_update(
            pf, t.z, t.z_mask, R, cfg.gate_assoc, cfg.pf_gate_newfeat,
            sensor_range=cfg.vehicle.sensor_range,
            visibility_margin=cfg.pf_visibility_margin,
        )
        pf2 = maintain_maps(pf2, cfg.pf_merge_radius, cfg.pf_prune_below)
        neff_pre = effective_sample_size(pf2.logw)
        pf2 = maybe_resample(pf2, jax.random.wrap_key_data(t.keys_r))
        pf = tree_select(act, pf2, pf)
        rec = ReplayRecord(
            est_pose=estimate_pose(pf),
            neff=neff_pre,
            resampled=neff_pre < 0.5 * pf.poses.shape[0],
            n_mean=jnp.mean(pf.n.astype(dtype)),
            logw_max=jnp.max(pf.logw),
        )
        return pf, rec

    return lax.scan(epoch, pf0, tape)
