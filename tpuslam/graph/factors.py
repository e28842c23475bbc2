"""Factor residuals + Jacobians for the pose-graph / BA backend.

No reference anchor (the reference is filtering-only); mandated by the
north star (BASELINE.json: "keyframe pose-graph / batch bundle-adjustment
backend over the same landmark blocks").  The observation model is the
same range-bearing sensor as the filter (src/common.jl:139-165), so a
reference user's measurements port directly.

All factors are evaluated batched + masked (static factor capacity).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.core.geometry import mpi_to_pi


def obs_residual(pose, lm, z):
    """Range-bearing observation residual r = z - h(pose, lm), (2,).

    Jacobians (closed-form, matching core.observation):
      A = dr/dpose (2,3), B = dr/dlm (2,2) — note r = z - h so signs flip
      relative to the measurement Jacobian H.
    """
    dx = lm[0] - pose[0]
    dy = lm[1] - pose[1]
    d2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    d = jnp.sqrt(d2)
    r = jnp.stack([z[0] - d, mpi_to_pi(z[1] - (jnp.arctan2(dy, dx) - pose[2]))])

    xd, yd = dx / d, dy / d
    xd2, yd2 = dx / d2, dy / d2
    # H = dh/dpose etc. (src/common.jl:160-162); A = -H_pose, B = -H_feat.
    A = -jnp.stack(
        [
            jnp.stack([-xd, -yd, jnp.zeros_like(xd)]),
            jnp.stack([yd2, -xd2, -jnp.ones_like(xd)]),
        ]
    )
    B = -jnp.stack(
        [
            jnp.stack([xd, yd]),
            jnp.stack([-yd2, xd2]),
        ]
    )
    return r, A, B


def obs_terms_flat(px, py, phi, lx, ly, z0, z1):
    """Component-wise (scalar-unrolled) form of `obs_residual` for batched
    evaluation on flat (F,) vectors.

    Returns (r0, r1, A, B) where A = ((A00, A01, A02), (A10, A11, A12)) and
    B = ((B00, B01), (B10, B11)) are tuples of (F,) arrays — the same
    values as obs_residual's stacked outputs.  Why this exists: on TPU,
    batched einsums over millions of 2x3 blocks lower to padded tiny
    dot_generals (~100x off roofline); unrolled components stay elementwise
    on the VPU.  Equivalence is tested in tests/test_ba_large.py.
    """
    dx = lx - px
    dy = ly - py
    d2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    d = jnp.sqrt(d2)
    r0 = z0 - d
    r1 = mpi_to_pi(z1 - (jnp.arctan2(dy, dx) - phi))

    xd, yd = dx / d, dy / d
    xd2, yd2 = dx / d2, dy / d2
    zero = jnp.zeros_like(d)
    one = jnp.ones_like(d)
    # A = -H_pose, B = -H_feat (signs as in obs_residual).
    A = ((xd, yd, zero), (-yd2, xd2, one))
    B = ((-xd, -yd), (yd2, -xd2))
    return r0, r1, A, B


def odo_residual(pose_i, pose_j, meas):
    """Relative-pose (odometry) residual in the frame of pose_i, (3,).

    meas = expected (dx_local, dy_local, dphi) from i to j.
    r = meas - (R(phi_i)^T (t_j - t_i), wrap(phi_j - phi_i))
    Jacobians Ji (3,3) wrt pose_i, Jj (3,3) wrt pose_j.
    """
    c, s = jnp.cos(pose_i[2]), jnp.sin(pose_i[2])
    dx = pose_j[0] - pose_i[0]
    dy = pose_j[1] - pose_i[1]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    dphi = mpi_to_pi(pose_j[2] - pose_i[2])
    r = jnp.stack(
        [meas[0] - lx, meas[1] - ly, mpi_to_pi(meas[2] - dphi)]
    )
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    # d r / d pose_i  (note r = meas - f, so J = -df/dpose).
    Ji = -jnp.stack(
        [
            jnp.stack([-c, -s, -s * dx + c * dy]),
            jnp.stack([s, -c, -c * dx - s * dy]),
            jnp.stack([zero, zero, -one]),
        ]
    )
    Jj = -jnp.stack(
        [
            jnp.stack([c, s, zero]),
            jnp.stack([-s, c, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )
    return r, Ji, Jj
