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


# Covariance dimension at/above which 'auto' picks the 3-pass (HIGH)
# bf16-emulation matmul for the dim^2-sized products.  Validated on the
# real chip against the float64 oracle at cap 4096 over a full course
# (scripts/validate_precision_tpu.py; PERF.md "precision auto-dispatch"):
# the HIGH-vs-HIGHEST state difference stays orders of magnitude below the
# f32-vs-f64 filter divergence, while the rank-k kernel moves from
# MXU-bound to its HBM roofline.
AUTO_HIGH_MIN_DIM = 4096


@functools.lru_cache(None)
def _precision_mode() -> str:
    name = os.environ.get("TPUSLAM_BIG_MATMUL_PRECISION", "auto")
    if name not in ("high", "highest", "auto"):
        raise ValueError(f"TPUSLAM_BIG_MATMUL_PRECISION={name!r} "
                         "(want high | highest | auto)")
    return name


def big_matmul_precision(dim: int | None = None):
    """Precision for the dim^2-sized products of the fused epoch
    (P @ Hd^T and the rank-k panel update).

    HIGHEST is the 6-pass bf16 f32-emulation, HIGH the 3-pass one.  The
    default 'auto' uses HIGHEST below AUTO_HIGH_MIN_DIM (the products are
    HBM-bound there: extra passes are free) and HIGH at/above it (they go
    MXU-bound: 6-pass costs ~2x; accuracy impact validated negligible —
    see AUTO_HIGH_MIN_DIM).  TPUSLAM_BIG_MATMUL_PRECISION=highest|high
    forces one mode everywhere.  Small covariance algebra always stays
    HIGHEST regardless.  Call sites that know their covariance dimension
    pass `dim`; callers that don't get HIGHEST under 'auto'.
    """
    from jax import lax

    mode = _precision_mode()
    if mode == "auto":
        mode = ("high" if dim is not None and dim >= AUTO_HIGH_MIN_DIM
                else "highest")
    return {"high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[mode]
