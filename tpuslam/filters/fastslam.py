"""FastSLAM: Rao-Blackwellized particle filter, TPU-native.

The reference *declares* FastSLAM ("ongoing", README.md:6) — a `Particle`
type (pose, per-feature means, pose cov, feature cov, weight;
src/common.jl:14-20) and `PFSlamState` (src/common.jl:31-34) exist but no
algorithm code does.  This module finishes it, designed TPU-first:

  * particles are a leading batch axis over structure-of-arrays state
    (poses (Np,3), feature means (Np,cap,2), feature covs (Np,cap,2,2),
    log-weights (Np,)) — every per-particle op is vmapped, and the same
    axis shards across chips (parallel/fastslam_sharded.py);
  * FastSLAM 1.0 proposal: per-particle control-noise sampling through the
    bicycle motion model (the reference's add_control_noise! + step_vehicle
    pair, sim/sim-utils.jl:35-38 + src/common.jl:172-181);
  * per-landmark 2x2 EKFs with gated NN association per particle (same
    decision semantics as the joint-EKF path, assoc/nn.py, with the
    per-particle innovation covariance S = Hf Pf Hf' + R);
  * importance weights from the association likelihood, log-space;
    systematic resampling triggered on effective sample size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpuslam.assoc.nn import decide
from tpuslam.core.geometry import mpi_to_pi
from tpuslam.core.motion import step_vehicle
from tpuslam.core.observation import predict_observation_xy

_HI = lax.Precision.HIGHEST

_INF = jnp.inf
_LOG2PI = 1.8378770664093453


class PFState(NamedTuple):
    """Structure-of-arrays particle state (ref src/common.jl:14-34)."""

    poses: jnp.ndarray   # (Np, 3) per-particle vehicle pose
    fm: jnp.ndarray      # (Np, cap, 2) per-particle feature means
    fP: jnp.ndarray      # (Np, cap, 2, 2) per-particle feature covariances
    logw: jnp.ndarray    # (Np,) log importance weights (normalized-ish)
    n: jnp.ndarray       # (Np,) int32 active features per particle

    @property
    def num_particles(self) -> int:
        return self.poses.shape[0]

    @property
    def capacity(self) -> int:
        return self.fm.shape[1]


def make_pf_state(pose, n_particles: int, capacity: int,
                  dtype=jnp.float32) -> PFState:
    pose = jnp.asarray(pose, dtype)
    return PFState(
        poses=jnp.broadcast_to(pose, (n_particles, 3)).astype(dtype),
        fm=jnp.zeros((n_particles, capacity, 2), dtype),
        fP=jnp.zeros((n_particles, capacity, 2, 2), dtype),
        logw=jnp.full((n_particles,), -jnp.log(float(n_particles)), dtype),
        n=jnp.zeros((n_particles,), jnp.int32),
    )


def predict_particles(st: PFState, speed, gamma, Q, wheelbase, dt, key,
                      *, n_total: int | None = None, offset=None):
    """FastSLAM 1.0 proposal: sample controls per particle, step the motion
    model.  Q is the (2,2) control covariance (diag).

    For particle-sharded execution, pass the GLOBAL particle count as
    `n_total` and this shard's starting particle id as `offset`: the draw is
    the full (n_total, 2) normal block sliced locally, so a sharded run
    consumes bit-identical proposal noise to the single-chip run."""
    Np = st.poses.shape[0]
    dtype = st.poses.dtype
    sig = jnp.sqrt(jnp.stack([Q[0, 0], Q[1, 1]])).astype(dtype)
    if n_total is None:
        eps = jax.random.normal(key, (Np, 2), dtype) * sig
    else:
        eps_all = jax.random.normal(key, (n_total, 2), dtype)
        eps = lax.dynamic_slice(
            eps_all, (offset, jnp.zeros_like(offset)), (Np, 2)
        ) * sig
    v_p = speed + eps[:, 0]
    g_p = gamma + eps[:, 1]
    poses = jax.vmap(
        lambda p, v, g: step_vehicle(p, v, g, wheelbase, dt)
    )(st.poses, v_p, g_p)
    return st._replace(poses=poses)


def _particle_scores(pose, fm, fP, n, z, z_mask, R):
    """(nis, nd) score matrices for ONE particle: (max_nz, cap).

    S = Hf Pf Hf' + R (feature-only covariance — the particle pose is a
    sample, not a distribution)."""
    cap = fm.shape[0]
    zp, _, Hf = jax.vmap(lambda f: predict_observation_xy(pose, f))(fm)
    S = jnp.einsum("jok,jkl,jpl->jop", Hf, fP, Hf, precision=_HI) + R[None]

    a, b = S[:, 0, 0], S[:, 0, 1]
    c, d = S[:, 1, 0], S[:, 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    logdet = jnp.log(det)

    dv_r = z[:, None, 0] - zp[None, :, 0]
    dv_b = mpi_to_pi(z[:, None, 1] - zp[None, :, 1])
    nis = (
        d[None] * dv_r * dv_r - (b + c)[None] * dv_r * dv_b
        + a[None] * dv_b * dv_b
    ) * inv_det[None]
    nd = nis + logdet[None]

    valid = z_mask[:, None] & (jnp.arange(cap) < n)[None, :]
    return jnp.where(valid, nis, _INF), jnp.where(valid, nd, _INF)


def _particle_measurement(pose, fm, fP, n, z, z_mask, R, gate1, gate2):
    """Association + 2x2 EKF updates + augmentation for ONE particle.

    Returns (fm, fP, n, dlogw)."""
    cap = fm.shape[0]
    dtype = pose.dtype

    nis, nd = _particle_scores(pose, fm, fP, n, z, z_mask, R)
    idf, matched, new = decide(nis, nd, z_mask, gate1, gate2)

    # --- matched: per-observation 2x2 EKF on the associated feature.
    feats = fm[idf]
    zp, _, Hf = jax.vmap(lambda f: predict_observation_xy(pose, f))(feats)
    v = jnp.stack(
        [z[:, 0] - zp[:, 0], mpi_to_pi(z[:, 1] - zp[:, 1])], axis=-1
    )
    Pf = fP[idf]                                          # (nz, 2, 2)
    S = jnp.einsum("nok,nkl,npl->nop", Hf, Pf, Hf, precision=_HI) + R[None]
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    a, b_, c_, d = S[:, 0, 0], S[:, 0, 1], S[:, 1, 0], S[:, 1, 1]
    det = a * d - b_ * c_
    Sinv = (
        jnp.stack(
            [jnp.stack([d, -b_], -1), jnp.stack([-c_, a], -1)], -2
        ) / det[:, None, None]
    )
    K = jnp.einsum("nkl,npl,npo->nko", Pf, Hf, Sinv, precision=_HI)       # (nz, 2, 2)
    dmean = jnp.einsum("nko,no->nk", K, v, precision=_HI)
    # Joseph-form-ish: P' = (I - K Hf) P (symmetrized).
    IKH = jnp.eye(2, dtype=dtype)[None] - jnp.einsum("nko,nol->nkl", K, Hf, precision=_HI)
    Pf_new = jnp.einsum("nkl,nlm->nkm", IKH, Pf, precision=_HI)
    Pf_new = 0.5 * (Pf_new + jnp.swapaxes(Pf_new, -1, -2))

    # Apply the updates WITHOUT scatters (vmapped per-particle scatters are
    # the measured TPU bottleneck at 10k particles): one-hot matmul for the
    # mean deltas, argmax-gather select for the covariances.  If two
    # observations gate to the same feature in one epoch, mean deltas add
    # and the first observation's posterior covariance wins — an accepted
    # approximation of the (unspecified) reference behavior; the matched
    # likelihoods still both weigh in.
    slots = jnp.arange(cap)
    onehot_m = (
        (idf[:, None] == slots[None, :]) & matched[:, None]
    ).astype(dtype)                                    # (nz, cap)
    fm = fm + jnp.einsum("nj,nk->jk", onehot_m, dmean, precision=_HI)
    hit = jnp.any(onehot_m > 0, axis=0)                # (cap,)
    sel = jnp.argmax(onehot_m, axis=0)                 # first matching obs
    fP = jnp.where(hit[:, None, None], Pf_new[sel], fP)

    # Weight: product of matched-observation likelihoods N(v; 0, S).
    quad = jnp.einsum("no,nop,np->n", v, Sinv, v, precision=_HI)
    loglik = -0.5 * (quad + jnp.log(det) + 2.0 * _LOG2PI)
    dlogw = jnp.sum(jnp.where(matched, loglik, 0.0))

    # --- new features: initialize mean from the particle pose, cov from
    # the measurement Jacobian (Gz R Gz').  Scatter-free: new slots hold
    # exact zeros (state invariant), so the mean lands via one-hot matmul
    # and the covariance via argmax-gather select (slots are distinct).
    mi = new.astype(jnp.int32)
    pos = n + jnp.cumsum(mi) - mi
    ok = new & (pos < cap)
    r, bb = z[:, 0], z[:, 1]
    s = jnp.sin(pose[2] + bb)
    c = jnp.cos(pose[2] + bb)
    fxy = jnp.stack([pose[0] + r * c, pose[1] + r * s], axis=-1)
    Gz = jnp.stack(
        [jnp.stack([c, -r * s], -1), jnp.stack([s, r * c], -1)], -2
    )
    P0 = jnp.einsum("nok,kl,npl->nop", Gz, R, Gz, precision=_HI)
    onehot_n = (
        (pos[:, None] == slots[None, :]) & ok[:, None]
    ).astype(dtype)                                    # (nz, cap)
    fm = fm + jnp.einsum("nj,nk->jk", onehot_n, fxy, precision=_HI)
    hit_n = jnp.any(onehot_n > 0, axis=0)
    sel_n = jnp.argmax(onehot_n, axis=0)
    fP = jnp.where(hit_n[:, None, None], P0[sel_n], fP)
    n = jnp.minimum(n + jnp.sum(mi, dtype=n.dtype), cap).astype(n.dtype)

    return fm, fP, n, dlogw.astype(dtype)


def measurement_update(st: PFState, z, z_mask, R, gate1, gate2) -> PFState:
    """Vmapped per-particle association + map update + weight update."""
    fm, fP, n, dlogw = jax.vmap(
        lambda p, m, c, k: _particle_measurement(
            p, m, c, k, z, z_mask, R, gate1, gate2
        )
    )(st.poses, st.fm, st.fP, st.n)
    logw = st.logw + dlogw
    logw = logw - jax.scipy.special.logsumexp(logw)  # normalize
    return PFState(poses=st.poses, fm=fm, fP=fP, logw=logw, n=n)


def effective_sample_size(logw):
    w = jnp.exp(logw - jax.scipy.special.logsumexp(logw))
    return 1.0 / jnp.sum(w * w)


def systematic_resample_indices(logw, key):
    """Systematic (low-variance) resampling indices, (Np,) int32."""
    Np = logw.shape[0]
    w = jnp.exp(logw - jax.scipy.special.logsumexp(logw))
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    pts = (jnp.arange(Np, dtype=w.dtype) + u) / Np
    return jnp.searchsorted(cum, pts).astype(jnp.int32).clip(0, Np - 1)


def maybe_resample(st: PFState, key, threshold: float = 0.5) -> PFState:
    """Resample when Neff < threshold * Np (branch-free select)."""
    Np = st.poses.shape[0]
    neff = effective_sample_size(st.logw)
    do = neff < threshold * Np
    idx = systematic_resample_indices(st.logw, key)
    idx = jnp.where(do, idx, jnp.arange(Np, dtype=idx.dtype))
    flat = -jnp.log(float(Np)) * jnp.ones_like(st.logw)
    return PFState(
        poses=st.poses[idx],
        fm=st.fm[idx],
        fP=st.fP[idx],
        logw=jnp.where(do, flat, st.logw),
        n=st.n[idx],
    )


def estimate_pose(st: PFState):
    """Weighted mean pose (circular mean for the heading)."""
    w = jnp.exp(st.logw - jax.scipy.special.logsumexp(st.logw))
    xy = jnp.einsum("p,pk->k", w, st.poses[:, :2])
    sphi = jnp.sum(w * jnp.sin(st.poses[:, 2]))
    cphi = jnp.sum(w * jnp.cos(st.poses[:, 2]))
    return jnp.concatenate([xy, jnp.arctan2(sphi, cphi)[None]])
