"""Matmul precision helpers shared by the Pallas TPU kernels.

TPU MXUs multiply in bf16; XLA emulates f32 matmuls by splitting each
operand into bf16 hi/lo parts: HIGHEST = 6 passes (3x3 minus negligible
terms), HIGH = 3 passes (hi*hi + lo*hi + hi*lo).  Mosaic (the Pallas TPU
compiler) only lowers precision=HIGHEST/DEFAULT — `precision=HIGH` raises
NotImplementedError — so the 3-pass variant is implemented here explicitly:
the same split XLA performs, written out as three DEFAULT-precision bf16
dots with f32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _split_bf16(a):
    """hi/lo bf16 split of an f32 operand: a ~= hi + lo exactly to ~16
    mantissa bits."""
    a32 = a.astype(jnp.float32)
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot_general_3pass(a, b, dimension_numbers):
    """f32 dot_general via the 3-pass bf16 emulation (== XLA's HIGH).

    Error terms: drops only lo*lo (2^-16 relative) — identical structure to
    XLA's Precision.HIGH lowering, but expressible inside a Pallas kernel.
    """
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)

    def d(x, y):
        return lax.dot_general(
            x, y, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)


def dot_general_prec(a, b, dimension_numbers, precision):
    """dot_general honoring the big-matmul precision policy inside Pallas:
    HIGH -> explicit 3-pass emulation; anything else -> native lowering."""
    if precision == lax.Precision.HIGH:
        return dot_general_3pass(a, b, dimension_numbers)
    return lax.dot_general(
        a, b, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32, precision=precision,
    )
