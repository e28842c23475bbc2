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


@functools.lru_cache(None)
def big_matmul_precision():
    """Precision for the two dim^2-sized products of the fused epoch
    (P @ Hd^T and the rank-k panel update).  Default HIGHEST (6-pass f32
    emulation); TPUSLAM_BIG_MATMUL_PRECISION=high selects the 3-pass
    variant — measured accuracy-neutral on course1, ~lower cost at
    cap >= 4096 where these products dominate.  Small covariance algebra
    always stays HIGHEST.
    """
    from jax import lax

    name = os.environ.get("TPUSLAM_BIG_MATMUL_PRECISION", "highest")
    return {"high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[name]
