"""Device-mesh construction for the SLAM engine.

Axes:
  'map'      — landmark-block axis: block rows of the landmark-landmark
               covariance (EKF) / landmark blocks (BA) are sharded here.
               The "tensor-parallel" analog; collectives ride ICI.
  'particle' — FastSLAM particle axis: the "data-parallel" analog.

On a multi-host pod slice, put 'map' innermost (ICI) and 'particle' across
hosts (DCN) — particle resampling is the only cross-host exchange and is
O(particles), while the map-axis Schur collectives are O(cap * nz).
"""

from __future__ import annotations

import jax
import numpy as np


def make_slam_mesh(n_map: int = 1, n_particle: int = 1, devices=None):
    """Build a (particle, map) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    need = n_map * n_particle
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_particle, n_map)
    return jax.sharding.Mesh(dev, ("particle", "map"))
