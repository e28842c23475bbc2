"""Geometry / angle / frame-transform primitives.

Behavioral spec: reference src/common.jl:75-132 (inbounds, get_waypoints,
initial_pose, mpi_to_pi, local_to_global).  All functions here are pure,
shape-polymorphic via broadcasting, and safe under jit/vmap/grad.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

TWO_PI = 2.0 * np.pi


def mpi_to_pi(phi):
    """Single-branch wrap of an angle into [-pi, pi].

    Faithful to reference src/common.jl:102-110, which applies *at most one*
    2*pi correction (it is not a full modular reduction).  All call sites in
    the reference feed angles within one wrap of range, so this matters only
    for exact numeric parity.
    """
    phi = jnp.asarray(phi)
    phi = jnp.where(phi > jnp.pi, phi - TWO_PI, phi)
    phi = jnp.where(phi < -jnp.pi, phi + TWO_PI, phi)
    return phi


def wrap_angle(phi):
    """Full modular reduction into [-pi, pi) — use where inputs may be far
    outside range (e.g. accumulated sums).  Not in the reference."""
    return jnp.mod(phi + jnp.pi, TWO_PI) - jnp.pi


def inbounds(xy, boundaries):
    """True where point(s) fall inside scene boundaries.

    Ref src/common.jl:75-79.  `xy`: (..., 2) array; `boundaries`:
    (xmin, xmax, ymin, ymax).
    """
    xy = jnp.asarray(xy)
    xmin, xmax, ymin, ymax = boundaries
    x, y = xy[..., 0], xy[..., 1]
    return (xmin <= x) & (x <= xmax) & (ymin <= y) & (y <= ymax)


def local_to_global(points_local, pose):
    """Transform local-frame points/poses into the global frame.

    Ref src/common.jl:118-132.  `points_local`: (N, 2) positions or (N, 3)
    poses (row-major — note the reference is column-major 2xN/3xN; we use the
    JAX-conventional leading batch axis).  `pose`: (3,) global vehicle pose.
    """
    points_local = jnp.asarray(points_local)
    pose = jnp.asarray(pose)
    phi = pose[2]
    c, s = jnp.cos(phi), jnp.sin(phi)
    x = points_local[..., 0]
    y = points_local[..., 1]
    gx = c * x - s * y + pose[0]
    gy = s * x + c * y + pose[1]
    if points_local.shape[-1] == 3:
        gphi = mpi_to_pi(points_local[..., 2] + phi)
        return jnp.stack([gx, gy, gphi], axis=-1)
    return jnp.stack([gx, gy], axis=-1)


def read_waypoints(path: str) -> np.ndarray:
    """Load an (N, 2) waypoint array from a 2-column headered text file.

    Ref src/common.jl:84-87 (which returns 2xN; we return N x 2).
    Host-side I/O — NumPy, not JAX.
    """
    return np.loadtxt(path, skiprows=1, dtype=np.float64)


def initial_pose(waypoints) -> jnp.ndarray:
    """[x, y, phi] at the first waypoint, heading toward the second.

    Ref src/common.jl:93-96.  `waypoints`: (N, 2).
    """
    wp = jnp.asarray(waypoints)
    phi = jnp.arctan2(wp[1, 1] - wp[0, 1], wp[1, 0] - wp[0, 0])
    return jnp.array([wp[0, 0], wp[0, 1], phi], dtype=wp.dtype)
