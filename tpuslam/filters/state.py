"""Fixed-capacity masked SLAM state containers.

The reference grows the joint state vector and covariance dynamically as
features are observed (src/ekf.jl:84-122, flagged inefficient in-source at
ekf.jl:106-107).  Dynamic shapes are the single biggest impedance mismatch
with XLA, so the TPU-native state is *preallocated at capacity* with an
active-feature count `n`; augmentation becomes a masked scatter and every
kernel sees static shapes.

Layout matches the reference joint state (src/common.jl:25-28):
  x = [pose_x, pose_y, pose_phi, f0_x, f0_y, f1_x, f1_y, ...]   (3 + 2*cap,)
  P = dense joint covariance                                     (dim, dim)
Slots >= n are zero in P and arbitrary in x; all consumers mask on `n`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EKFState(NamedTuple):
    """EKF-SLAM joint state (ref src/common.jl:25-28, + capacity mask)."""

    x: jnp.ndarray   # (3 + 2*cap,) joint pose + feature means
    P: jnp.ndarray   # (3 + 2*cap, 3 + 2*cap) joint covariance
    n: jnp.ndarray   # () int32 — number of active features

    @property
    def capacity(self) -> int:
        return (self.x.shape[0] - 3) // 2

    @property
    def dim(self) -> int:
        return self.x.shape[0]

    @property
    def pose(self) -> jnp.ndarray:
        return self.x[:3]

    @property
    def features(self) -> jnp.ndarray:
        """(cap, 2) feature positions (rows >= n are garbage; mask on n)."""
        return self.x[3:].reshape(self.capacity, 2)

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n


def grow_capacity(state: EKFState, new_capacity: int) -> EKFState:
    """Re-embed the state into a larger capacity (recompile tier).

    XLA needs static shapes, so long runs that outgrow their landmark
    capacity step up through capacity tiers: embed (exact copy of the
    active blocks, zeros elsewhere — the class invariant) and recompile at
    the new shape.  SURVEY.md section 7 'hard parts' (a).
    """
    cap = state.capacity
    if new_capacity < cap:
        raise ValueError("capacity can only grow")
    dim_old = 3 + 2 * cap
    dim_new = 3 + 2 * new_capacity
    x = jnp.zeros((dim_new,), state.x.dtype).at[:dim_old].set(state.x)
    P = jnp.zeros((dim_new, dim_new), state.P.dtype)
    P = P.at[:dim_old, :dim_old].set(state.P)
    return EKFState(x=x, P=P, n=state.n)


def make_ekf_state(pose, capacity: int, dtype=jnp.float32) -> EKFState:
    """Initial state: true pose, zero covariance, empty map.

    Ref sim/ekfslam-sim.jl:42 — the filter starts at the exact initial pose
    with P = zeros(3,3).
    """
    dim = 3 + 2 * capacity
    x = jnp.zeros((dim,), dtype=dtype).at[:3].set(jnp.asarray(pose, dtype=dtype))
    P = jnp.zeros((dim, dim), dtype=dtype)
    return EKFState(x=x, P=P, n=jnp.zeros((), dtype=jnp.int32))
