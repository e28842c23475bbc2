"""Small pytree utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_select(pred, on_true, on_false):
    """Elementwise `jnp.where(pred, a, b)` over matching pytrees.

    `pred` is a scalar (or broadcastable) boolean.  Used to realize the
    reference's early-exit control flow (sim loop termination, skipped
    steering updates) as masked select under jit/scan.
    """
    return jax.tree.map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )
