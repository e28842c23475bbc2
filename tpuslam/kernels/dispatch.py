"""Backend dispatch for the Pallas TPU kernels.

The compute-path kernels have two implementations: a Pallas TPU kernel
(used on TPU backends) and the pure-XLA formulation (CPU, tests, and the
virtual multi-device CPU mesh).  `TPUSLAM_NO_PALLAS=1` forces XLA
everywhere (escape hatch).
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(None)
def use_pallas() -> bool:
    if os.environ.get("TPUSLAM_NO_PALLAS") == "1":
        return False
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
