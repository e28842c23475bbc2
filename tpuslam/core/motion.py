"""Bicycle-model vehicle kinematics and waypoint-chasing steering.

Behavioral spec: reference src/common.jl:172-230 (step_vehicle!, steer!) and
the motion Jacobians from src/ekf.jl:22-29.  Pure-functional: the reference
mutates a Vehicle struct; here every function maps inputs to outputs and is
jit/scan-safe (branch-free via `jnp.where` / clamped gathers).

Waypoint indices are 0-based; the sentinel for "course finished" is -1
(reference uses 1-based indices with sentinel 0, src/common.jl:203-207).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.core.geometry import mpi_to_pi


def step_vehicle(pose, speed, gamma, wheelbase, dt):
    """Advance the bicycle-model equations of motion by dt.

    Ref src/common.jl:172-181:
        x   += v*dt*cos(g + phi)
        y   += v*dt*sin(g + phi)
        phi  = wrap(phi + v*dt*sin(g)/wheelbase)
    """
    x, y, phi = pose[0], pose[1], pose[2]
    vdt = speed * dt
    new = jnp.stack(
        [
            x + vdt * jnp.cos(gamma + phi),
            y + vdt * jnp.sin(gamma + phi),
            mpi_to_pi(phi + vdt * jnp.sin(gamma) / wheelbase),
        ]
    )
    return new


def motion_jacobians(phi, speed, gamma, wheelbase, dt):
    """Jacobians of the motion model wrt pose (Gv, 3x3) and controls (Gu, 3x2).

    Ref src/ekf.jl:17-29.  Evaluated at the (noisy) measured controls in the
    EKF predict step.
    """
    s = jnp.sin(gamma + phi)
    c = jnp.cos(gamma + phi)
    vts = speed * dt * s
    vtc = speed * dt * c
    one = jnp.ones_like(vts)
    zero = jnp.zeros_like(vts)
    Gv = jnp.stack(
        [
            jnp.stack([one, zero, -vts]),
            jnp.stack([zero, one, vtc]),
            jnp.stack([zero, zero, one]),
        ]
    )
    Gu = jnp.stack(
        [
            jnp.stack([dt * c, -vts]),
            jnp.stack([dt * s, vtc]),
            jnp.stack(
                [dt * jnp.sin(gamma) / wheelbase,
                 speed * dt * jnp.cos(gamma) / wheelbase]
            ),
        ]
    )
    return Gv, Gu


def steer(pose, gamma, waypoint_id, waypoints, d_min, dt, steer_rate, max_gamma):
    """Waypoint-following steering controller.

    Ref src/common.jl:189-230 (steer!).  Semantics reproduced exactly:
      * advance to the next waypoint once within d_min of the current one;
      * if that advance runs past the last waypoint, flag course-finished
        (waypoint_id -> -1) and leave the steering angle UNCHANGED this tick
        (the reference early-returns, src/common.jl:203-207);
      * otherwise steer toward the (possibly newly advanced) waypoint with
        the steering-rate clamp then the max-angle clamp.

    Args:
      pose: (3,) vehicle pose.
      gamma: scalar current target steering angle.
      waypoint_id: int32 current waypoint index (0-based; -1 = finished).
      waypoints: (N, 2) course.
      d_min, dt, steer_rate, max_gamma: scalars.

    Returns: (new_gamma, new_waypoint_id)
    """
    n_wp = waypoints.shape[0]
    x, y, phi = pose[0], pose[1], pose[2]

    active = waypoint_id >= 0
    iwp = jnp.maximum(waypoint_id, 0)

    cwp = waypoints[iwp]
    d2 = (cwp[0] - x) ** 2 + (cwp[1] - y) ** 2
    reached = d2 < d_min**2

    iwp_next = jnp.where(reached, iwp + 1, iwp)
    finished = reached & (iwp_next >= n_wp)

    tgt = waypoints[jnp.minimum(iwp_next, n_wp - 1)]

    # Steering-angle change toward target, rate- and range-clamped.
    dg = mpi_to_pi(jnp.arctan2(tgt[1] - y, tgt[0] - x) - phi - gamma)
    dg_max = steer_rate * dt
    dg = jnp.clip(dg, -dg_max, dg_max)
    g_new = jnp.clip(gamma + dg, -max_gamma, max_gamma)

    update_gamma = active & ~finished
    new_gamma = jnp.where(update_gamma, g_new, gamma)
    new_waypoint_id = jnp.where(
        active, jnp.where(finished, -1, iwp_next), waypoint_id
    )
    return new_gamma, new_waypoint_id
