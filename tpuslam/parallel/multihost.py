"""Multi-host (DCN) scale-out helpers.

The reference is single-process (SURVEY.md section 5, "distributed
communication backend: none"); the TPU-native equivalent of its missing
NCCL/MPI layer is jax.distributed + XLA collectives.  This module owns the
process-level bootstrap and the host-spanning mesh construction for
BASELINE config 5 (1M landmarks, N >= 2 hosts):

  * the 'map' (landmark-block) axis is laid out INNERMOST so its per-update
    Schur collectives (psum of the small S system + the gain-panel
    all_gather, parallel/ekf_sharded.py) ride ICI within each host;
  * the 'particle' axis spans hosts — FastSLAM's only cross-host exchange
    is the O(Np) weight gather and occasional resampling traffic
    (parallel/fastslam_sharded.py), which tolerates DCN latency.

On a single-host session these helpers degrade to the local mesh; the
multi-host code path is exercised by the driver's virtual-device dryrun.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Bring up jax.distributed from explicit args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process and nothing is configured."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=(num_processes
                       if num_processes is not None
                       else int(os.environ.get("JAX_NUM_PROCESSES", "1"))),
        process_id=(process_id
                    if process_id is not None
                    else int(os.environ.get("JAX_PROCESS_ID", "0"))),
    )


def make_multihost_mesh(map_per_host: int | None = None):
    """(particle, map) mesh over ALL processes' devices: 'map' innermost
    (ICI), 'particle' across hosts (DCN)."""
    devices = jax.devices()  # globally ordered, host-major
    n_local = jax.local_device_count()
    n_map = map_per_host or n_local
    total = len(devices)
    if total % n_map != 0:
        raise ValueError(
            f"{total} devices not divisible by map axis {n_map}"
        )
    dev = np.asarray(devices).reshape(total // n_map, n_map)
    return jax.sharding.Mesh(dev, ("particle", "map"))
