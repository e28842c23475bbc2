"""Simulated range-bearing sensor and control-noise models (device-side).

Behavioral spec: reference sim/sim-utils.jl:12-75 (nearby_landmark_indices,
add_control_noise!, get_observations).  TPU-native differences:

  * visibility is a batched mask over the full landmark array, and the
    variable-length observation list becomes a stable-sort compaction into a
    fixed (max_obs, 2) buffer + mask — static shapes under jit;
  * noise enters as explicit arrays (one [range, bearing] pair per landmark
    per epoch, one [speed, steer] pair per tick) so the NumPy oracle and the
    JAX engine can consume the *identical* stream and be compared
    trajectory-for-trajectory.  (The reference draws from a global RNG at
    the point of use; per-landmark indexing is distribution-identical.)
"""

from __future__ import annotations

import jax.numpy as jnp


def visible_mask(pose, landmarks, sensor_range):
    """Which landmarks the sensor can see.

    Ref sim/sim-utils.jl:12-28: within the *front half-plane* of the heading
    (dx*cos(phi) + dy*sin(phi) > 0) AND inside the sensor range.
    """
    dx = landmarks[:, 0] - pose[0]
    dy = landmarks[:, 1] - pose[1]
    phi = pose[2]
    front = dx * jnp.cos(phi) + dy * jnp.sin(phi) > 0
    inrange = dx * dx + dy * dy < sensor_range * sensor_range
    return front & inrange


def get_observations(pose, landmarks, sensor_range, obs_noise, max_obs):
    """Noisy range-bearing observations of visible landmarks, compacted.

    Ref sim/sim-utils.jl:53-75.  Observations are ordered by ascending
    landmark index (matching the reference's push order), compacted to the
    first `max_obs` slots; if more than max_obs landmarks are visible the
    overflow is dropped (the reference is uncapped — size max_obs to cover
    the worst case of a scenario).

    Args:
      obs_noise: (n_landmarks, 2) standard-normal draws, scaled by the
        caller's [sigma_range, sigma_bearing] before the call OR raw —
        convention here: *already scaled* noise to ADD to [range, bearing].

    Returns:
      z: (max_obs, 2); z_mask: (max_obs,) bool; lm_idx: (max_obs,) int32
      (ground-truth landmark ids — returned like the reference's tags,
       sim/sim-utils.jl:71-74, and like them never used by association).
    """
    n = landmarks.shape[0]
    dx = landmarks[:, 0] - pose[0]
    dy = landmarks[:, 1] - pose[1]
    vis = visible_mask(pose, landmarks, sensor_range)

    d = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12))
    bearing = jnp.arctan2(dy, dx) - pose[2]  # unwrapped, as in the reference
    z_all = jnp.stack([d, bearing], axis=-1) + obs_noise

    # Stable compaction WITHOUT a sort: slot = rank among visible (cumsum
    # preserves ascending index order), gathered by one-hot matmul.  An
    # argsort over the full landmark array costs ~ms at 100k landmarks on
    # TPU and dominated the whole epoch in the 20k-landmark scale run;
    # this is a 3.8 MB one-hot stream instead.
    slot = jnp.cumsum(vis) - 1
    hit = vis & (slot < max_obs)
    onehot = (slot[:, None] == jnp.arange(max_obs)[None, :]) & hit[:, None]
    oh = onehot.astype(z_all.dtype)
    z = oh.T @ z_all                                     # (max_obs, 2)
    n_vis = jnp.sum(vis)
    z_mask = jnp.arange(max_obs) < n_vis
    # Padding rows get a harmless finite observation (range 1, bearing 0):
    # downstream Jacobians divide by range, and poisoning masked slots
    # with 0 would breed inf*0 NaNs.
    z = jnp.where(z_mask[:, None], z,
                  jnp.asarray([1.0, 0.0], z_all.dtype))
    idx = jnp.sum(onehot * jnp.arange(n, dtype=jnp.int32)[:, None],
                  axis=0, dtype=jnp.int32)
    return z, z_mask, idx


def add_control_noise(target_speed, target_gamma, ctrl_noise):
    """Measured (noisy) controls. Ref sim/sim-utils.jl:35-38.

    `ctrl_noise`: (2,) *already scaled* additive noise [speed, gamma].
    """
    return target_speed + ctrl_noise[0], target_gamma + ctrl_noise[1]
