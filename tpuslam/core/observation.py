"""Range-bearing observation model.

Behavioral spec: reference src/common.jl:139-165 (predict_observation).

The reference builds a dense 2 x len(x) Jacobian H whose only nonzeros are a
2x3 pose block and a 2x2 feature block (src/common.jl:160-162), then feeds it
to dense products everywhere.  Here H is *represented sparsely* as those two
blocks (the TPU-native design exploits the sparsity: `P @ H^T` is a 5-column
gather, not a dense matmul over the full state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predict_observation(x, idf):
    """Predicted [range, bearing] of feature `idf` (0-based) in flat state x.

    Ref src/common.jl:139-165.  x layout: [pose(3); f0x f0y f1x f1y ...].

    Returns:
      z: (2,) predicted observation
      Hp: (2, 3) Jacobian block wrt pose
      Hf: (2, 2) Jacobian block wrt the feature position
    """
    fpos = 3 + 2 * idf
    dx = x[fpos] - x[0]
    dy = x[fpos + 1] - x[1]
    return _range_bearing_jacobians(dx, dy, x[2])


def predict_observation_xy(pose, feature_xy):
    """Same as predict_observation, from pose (3,) + feature position (2,)."""
    dx = feature_xy[0] - pose[0]
    dy = feature_xy[1] - pose[1]
    return _range_bearing_jacobians(dx, dy, pose[2])


def _range_bearing_jacobians(dx, dy, phi):
    d2 = dx * dx + dy * dy
    # Guard: an uninitialized (masked-out) feature can coincide with the
    # vehicle; keep the math finite, masking happens downstream.
    d2 = jnp.maximum(d2, 1e-12)
    d = jnp.sqrt(d2)
    z = jnp.stack([d, jnp.arctan2(dy, dx) - phi])

    xd = dx / d
    yd = dy / d
    xd2 = dx / d2
    yd2 = dy / d2
    # Ref src/common.jl:160-162.
    Hp = jnp.stack(
        [
            jnp.stack([-xd, -yd, jnp.zeros_like(xd)]),
            jnp.stack([yd2, -xd2, -jnp.ones_like(xd)]),
        ]
    )
    Hf = jnp.stack(
        [
            jnp.stack([xd, yd]),
            jnp.stack([-yd2, xd2]),
        ]
    )
    return z, Hp, Hf


def predict_observations_batch(pose, features):
    """Vectorized predict_observation over all map slots.

    Args:
      pose: (3,) vehicle pose estimate.
      features: (cap, 2) feature position estimates (masked slots arbitrary).

    Returns:
      z: (cap, 2), Hp: (cap, 2, 3), Hf: (cap, 2, 2)
    """
    return jax.vmap(lambda f: predict_observation_xy(pose, f))(features)
