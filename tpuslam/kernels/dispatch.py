"""Backend dispatch for the Pallas TPU kernels.

The compute-path kernels have two implementations: a Pallas TPU kernel
(used on TPU backends) and the pure-XLA formulation (CPU, tests, and the
virtual multi-device CPU mesh).  `TPUSLAM_NO_PALLAS=1` forces XLA
everywhere (escape hatch).
"""

from __future__ import annotations

import functools
import os


# Per-kernel dim thresholds above which the Pallas implementation beats
# XLA's fusion, measured on the real chip (scripts/roofline_tpu.py; PERF.md
# "kernel rooflines", v5e, both precision modes):
#   * pht_and_s: XLA wins at EVERY size (one fused matmul pair reaching
#     90% of the HBM roofline at dim 16k vs the Pallas kernel's 62%) —
#     threshold inf, i.e. the Pallas kernel is kept for study/regression
#     but never auto-dispatched;
#   * rank_k:    Pallas wins from dim ~8k (430 vs 309 GB/s at 16k in HIGH:
#     the in-place aliased single pass beats XLA, which materializes
#     P + Delta into a fresh buffer).
_PALLAS_MIN_DIM = {"pht_s": float("inf"), "rank_k": 8192}


def use_pallas_for(dim: int, kernel: str = "rank_k",
                   dtype=None) -> bool:
    """True when the Pallas implementation of `kernel` is the measured
    winner at covariance dimension `dim` (and we're on a TPU backend).
    TPUSLAM_FORCE_PALLAS=1 overrides the thresholds (benchmarks/tests).

    `dtype` is the storage dtype of the P operand when the caller uses
    reduced-precision map storage: Mosaic cannot lower float16 at all
    ("Unsupported type in mosaic dialect: 'f16'", measured at cap 24576),
    so fp16-stored blocks always take the XLA path — slower per byte
    (~38% vs ~70% of the rank-k roofline at dim 16k) but the only
    compilable one, and the fp16 rows exist to extend the MEMORY
    envelope, which XLA still honors."""
    if dtype is not None:
        import jax.numpy as jnp

        if jnp.dtype(dtype) == jnp.float16:
            return False
    if not use_pallas():
        return False
    if os.environ.get("TPUSLAM_FORCE_PALLAS") == "1":
        return True
    return dim >= _PALLAS_MIN_DIM[kernel]


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
