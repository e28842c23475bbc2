"""Covariance-ellipse and lidar-segment display math.

Behavioral spec: reference src/common.jl:237-283 (ellipse,
compute_landmark_ellipses, laser_lines) and the eigendecomposition ellipse
parameterization from sim/browser/wsserver.jl:72-85.

All 2x2 matrix functions use closed forms (sqrtm / eig of a symmetric 2x2) —
no LAPACK, fully batchable on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.core.geometry import local_to_global


def sqrtm_2x2_psd(P):
    """Principal square root of a symmetric PSD 2x2 matrix, closed form.

    For A with trace t and determinant d:  sqrt(A) = (A + sqrt(d) I) / s,
    s = sqrt(t + 2 sqrt(d)).  (Denman: works for PSD 2x2.)
    """
    t = P[0, 0] + P[1, 1]
    d = P[0, 0] * P[1, 1] - P[0, 1] * P[1, 0]
    sd = jnp.sqrt(jnp.maximum(d, 0.0))
    s = jnp.sqrt(jnp.maximum(t + 2.0 * sd, 1e-20))
    return (P + sd * jnp.eye(2, dtype=P.dtype)) / s


def eig_2x2_sym(P):
    """Eigenvalues (descending) and first eigenvector angle of symmetric 2x2.

    Returns (lam1, lam2, theta) with lam1 >= lam2 and theta the angle of the
    lam1 eigenvector.  Used for the browser 'feature-ellipses' message
    (ref sim/browser/wsserver.jl:72-85).
    """
    a, b, c = P[0, 0], P[0, 1], P[1, 1]
    tr = a + c
    disc = jnp.sqrt(jnp.maximum(((a - c) / 2.0) ** 2 + b * b, 0.0))
    lam1 = tr / 2.0 + disc
    lam2 = tr / 2.0 - disc
    theta = 0.5 * jnp.arctan2(2.0 * b, a - c)
    return lam1, lam2, theta


def ellipse(center, P, nsigma=2.0, nsegs=12):
    """n-sigma Gaussian contour as (nsegs+1, 2) polyline.

    Ref src/common.jl:237-243: nsigma * sqrtm(P) @ [cos(phi); sin(phi)] + x.
    """
    phi = jnp.linspace(0.0, 2.0 * jnp.pi, nsegs + 1)
    circ = jnp.stack([jnp.cos(phi), jnp.sin(phi)])  # (2, nsegs+1)
    pts = nsigma * (sqrtm_2x2_psd(P) @ circ)
    return (pts + jnp.asarray(center)[:2, None]).T


def compute_landmark_ellipses(state, nsigma=2.0, nsegs=12):
    """2-sigma ellipses for every landmark slot, batched.

    Ref src/common.jl:246-262.  Operates on a fixed-capacity EKFState
    (tpuslam.filters.state.EKFState); returns (cap, nsegs+1, 2) with slots
    >= state.n meaningless (mask with `jnp.arange(cap) < state.n`).
    """
    cap = (state.x.shape[0] - 3) // 2
    centers = state.x[3:].reshape(cap, 2)
    blocks = _landmark_cov_blocks(state.P, cap)
    return jax.vmap(lambda c, B: ellipse(c, B, nsigma, nsegs))(centers, blocks)


def _landmark_cov_blocks(P, cap):
    """(cap, 2, 2) diagonal blocks of the landmark part of P."""
    idx = 3 + 2 * jnp.arange(cap)

    def block(i):
        return jax.lax.dynamic_slice(P, (i, i), (2, 2))

    return jax.vmap(block)(idx)


def laser_lines(z, pose):
    """Lidar beam segments vehicle -> observation, (nz, 4) rows [vx vy fx fy].

    Ref src/common.jl:269-283.  z: (nz, 2) columns [range, bearing].
    """
    z = jnp.asarray(z)
    r, b = z[..., 0], z[..., 1]
    xy_local = jnp.stack([r * jnp.cos(b), r * jnp.sin(b)], axis=-1)
    xy_global = local_to_global(xy_local, pose)
    v = jnp.broadcast_to(jnp.asarray(pose)[:2], xy_global.shape)
    return jnp.concatenate([v, xy_global], axis=-1)
