"""Backend dispatch for the Pallas TPU kernels.

The compute-path kernels have two implementations: a Pallas TPU kernel
(used on TPU backends) and the pure-XLA formulation (CPU, tests, and the
virtual multi-device CPU mesh).  `TPUSLAM_NO_PALLAS=1` forces XLA
everywhere (escape hatch).
"""

from __future__ import annotations

import functools
import os


def use_pallas_for(dim: int, min_dim: int = 1024) -> bool:
    """Pallas only where the covariance is big enough for the streaming
    kernels to beat XLA's fusions — small problems pay kernel-launch and
    (substantial, on this stack) Mosaic compile costs for nothing."""
    return dim >= min_dim and use_pallas()


@functools.lru_cache(None)
def use_pallas() -> bool:
    if os.environ.get("TPUSLAM_NO_PALLAS") == "1":
        return False
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
