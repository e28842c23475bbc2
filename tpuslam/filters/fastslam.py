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

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpuslam.assoc.nn import decide
from tpuslam.core.geometry import mpi_to_pi
from tpuslam.core.motion import step_vehicle
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
    cnt: jnp.ndarray     # (Np, cap) int32 per-feature evidence counter
    #   +1 per matched observation, init 2 on creation, -1 when the feature
    #   was expected visible but unmatched; maintain_maps prunes below the
    #   configured floor (classic FastSLAM landmark-existence evidence).

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
        cnt=jnp.zeros((n_particles, capacity), jnp.int32),
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
    # The broadcast of sig MUST be explicit: the axon TPU backend
    # miscompiles the fused diag-gather -> stack -> broadcast-multiply
    # pattern (`eps * sig` with sig = sqrt(stack([Q[0,0], Q[1,1]])))
    # into a program whose SECOND COLUMN IS ZERO — i.e. every particle
    # silently received zero steering noise on the chip.  This was the
    # entire r4 "chip-vs-CPU PF bias" open finding (12-seed chip-worse
    # separation, flat weights at Neff ~44, ghost minting): no heading
    # diversity in the proposal.  Repro: x * sqrt(stack([d[0,0],
    # d[1,1]])) of a jnp.diag matrix -> col1 zeros on TPU, exact on CPU;
    # jnp.broadcast_to sidesteps the bad fusion (scripts/chip_canary.py
    # guards the pattern on real hardware).
    sig = jnp.sqrt(jnp.stack([Q[0, 0], Q[1, 1]])).astype(dtype)
    if n_total is None:
        eps = jax.random.normal(key, (Np, 2), dtype) \
            * jnp.broadcast_to(sig, (Np, 2))
    else:
        eps_all = jax.random.normal(key, (n_total, 2), dtype)
        eps = lax.dynamic_slice(
            eps_all, (offset, jnp.zeros_like(offset)), (Np, 2)
        ) * jnp.broadcast_to(sig, (Np, 2))
    v_p = speed + eps[:, 0]
    g_p = gamma + eps[:, 1]
    poses = jax.vmap(
        lambda p, v, g: step_vehicle(p, v, g, wheelbase, dt)
    )(st.poses, v_p, g_p)
    return st._replace(poses=poses)


def _obs_components(pose, fx, fy):
    """Range-bearing prediction + feature Jacobian, scalar-unrolled.

    Same math as core.observation.predict_observation_xy's (zp, Hf), kept
    as flat component vectors: under a 10k-particle vmap, stacked 2x2
    blocks turn every downstream product into millions of padded tiny
    dot_generals (~100x off TPU roofline — same lesson as graph/ba_large);
    components stay elementwise on the VPU."""
    dx = fx - pose[0]
    dy = fy - pose[1]
    d2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    d = jnp.sqrt(d2)
    zr = d
    zb = jnp.arctan2(dy, dx) - pose[2]
    return zr, zb, (dx / d, dy / d, -dy / d2, dx / d2)


def _particle_scores(pose, fm, fP, n, z, z_mask, R):
    """(nis, nd) score matrices for ONE particle: (max_nz, cap).

    S = Hf Pf Hf' + R (feature-only covariance — the particle pose is a
    sample, not a distribution)."""
    cap = fm.shape[0]
    zr, zb, (h00, h01, h10, h11) = _obs_components(pose, fm[:, 0], fm[:, 1])
    p00, p01, p11 = fP[:, 0, 0], fP[:, 0, 1], fP[:, 1, 1]

    t00 = h00 * p00 + h01 * p01
    t01 = h00 * p01 + h01 * p11
    t10 = h10 * p00 + h11 * p01
    t11 = h10 * p01 + h11 * p11
    a = t00 * h00 + t01 * h01 + R[0, 0]
    b = t00 * h10 + t01 * h11 + R[0, 1]
    c = t10 * h00 + t11 * h01 + R[1, 0]
    d = t10 * h10 + t11 * h11 + R[1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    logdet = jnp.log(det)

    dv_r = z[:, None, 0] - zr[None, :]
    dv_b = mpi_to_pi(z[:, None, 1] - zb[None, :])
    nis = (
        d[None] * dv_r * dv_r - (b + c)[None] * dv_r * dv_b
        + a[None] * dv_b * dv_b
    ) * inv_det[None]
    nd = nis + logdet[None]

    valid = z_mask[:, None] & (jnp.arange(cap) < n)[None, :]
    return jnp.where(valid, nis, _INF), jnp.where(valid, nd, _INF)


def _particle_measurement(pose, fm, fP, n, cnt, z, z_mask, R, gate1, gate2,
                          sensor_range=None, visibility_margin=0.85):
    """Association + 2x2 EKF updates + augmentation for ONE particle.

    Also maintains the per-feature evidence counter: +1 per matched
    observation, 2 on creation, and (when `sensor_range` is given) -1 for
    features inside `visibility_margin * sensor_range` of the particle in
    its forward half-plane (the sim's visibility model,
    ref sim/sim-utils.jl:12-28) that matched nothing this epoch.

    Returns (fm, fP, n, cnt, dlogw)."""
    cap = fm.shape[0]
    dtype = pose.dtype

    nis, nd = _particle_scores(pose, fm, fP, n, z, z_mask, R)
    idf, matched, new = decide(nis, nd, z_mask, gate1, gate2)

    # Everything below is scalar-unrolled 2x2 component algebra on flat
    # vectors, with all per-feature reads/writes as one-hot mask-reduces:
    # under the 10k-particle vmap, stacked-block einsums and batched
    # gathers/scatters were the measured bottleneck (84 of the epoch's
    # 84.6 ms at 10k particles, found by stand-in ablation).
    slots = jnp.arange(cap)
    Esel = (idf[:, None] == slots[None, :]).astype(dtype)   # (nz, cap)

    # EVERY one-hot mask-reduce below is an explicit einsum pinned to
    # HIGHEST precision: written as (mask * x).sum(), XLA's algebraic
    # simplifier rewrites mul+reduce into dot_general, which the TPU
    # runs in bf16 by default — rounding ~100 m feature coordinates by
    # up to ~0.25 m.  That noise was the measured chip-vs-CPU PF bias
    # (paired-tape replay: chip Neff ~44 vs CPU ~27 and 60+ minted
    # slots vs 34 on every seed; the r4 12-seed chip-worse-than-CPU
    # separation).  estimate_pose pins the same pattern for the same
    # reason.
    def gather(xc):                      # (cap,) -> (nz,) via mask-reduce
        return jnp.einsum("oc,c->o", Esel, xc, precision=_HI)

    p00a, p01a, p11a = fP[:, 0, 0], fP[:, 0, 1], fP[:, 1, 1]
    fx = gather(fm[:, 0])
    fy = gather(fm[:, 1])
    p00 = gather(p00a)
    p01 = gather(p01a)
    p11 = gather(p11a)

    # --- matched: per-observation 2x2 EKF on the associated feature.
    zr, zb, (h00, h01, h10, h11) = _obs_components(pose, fx, fy)
    v0 = z[:, 0] - zr
    v1 = mpi_to_pi(z[:, 1] - zb)

    # HP = Hf P;  S = HP Hf' + R (symmetrized);  PHt = (HP)'.
    t00 = h00 * p00 + h01 * p01
    t01 = h00 * p01 + h01 * p11
    t10 = h10 * p00 + h11 * p01
    t11 = h10 * p01 + h11 * p11
    s00 = t00 * h00 + t01 * h01 + R[0, 0]
    s11 = t10 * h10 + t11 * h11 + R[1, 1]
    s01 = 0.5 * ((t00 * h10 + t01 * h11 + R[0, 1])
                 + (t10 * h00 + t11 * h01 + R[1, 0]))
    det = s00 * s11 - s01 * s01
    i00 = s11 / det
    i01 = -s01 / det
    i11 = s00 / det

    # K = PHt Sinv (PHt = HP' so pht_kl = t_lk).
    k00 = t00 * i00 + t10 * i01
    k01 = t00 * i01 + t10 * i11
    k10 = t01 * i00 + t11 * i01
    k11 = t01 * i01 + t11 * i11
    dm0 = k00 * v0 + k01 * v1
    dm1 = k10 * v0 + k11 * v1

    # P' = (I - K Hf) P, symmetrized.
    kh00 = k00 * h00 + k01 * h10
    kh01 = k00 * h01 + k01 * h11
    kh10 = k10 * h00 + k11 * h10
    kh11 = k10 * h01 + k11 * h11
    pn00 = (1.0 - kh00) * p00 - kh01 * p01
    pn11 = -kh10 * p01 + (1.0 - kh11) * p11
    pn01 = 0.5 * (((1.0 - kh00) * p01 - kh01 * p11)
                  + (-kh10 * p00 + (1.0 - kh11) * p01))

    # Apply WITHOUT scatters: mean deltas sum by one-hot mask; the first
    # matching observation's posterior covariance wins when two gate to
    # the same feature in one epoch (accepted approximation of the
    # unspecified reference behavior; both likelihoods still weigh in).
    Em = Esel * matched[:, None].astype(dtype)              # (nz, cap)

    def scatter(mask, xo):               # (nz,) -> (cap,) via mask-reduce
        return jnp.einsum("oc,o->c", mask, xo, precision=_HI)

    fm = fm + jnp.stack(
        [scatter(Em, dm0), scatter(Em, dm1)], axis=-1
    )
    hit = Em.sum(0) > 0
    F = Em * (jnp.cumsum(Em, axis=0) < 1.5)                 # first match
    q00 = scatter(F, pn00)
    q01 = scatter(F, pn01)
    q11 = scatter(F, pn11)

    # Weight: product of matched-observation likelihoods N(v; 0, S).
    quad = i00 * v0 * v0 + 2.0 * i01 * v0 * v1 + i11 * v1 * v1
    loglik = -0.5 * (quad + jnp.log(det) + 2.0 * _LOG2PI)
    dlogw = jnp.sum(jnp.where(matched, loglik, 0.0))

    # --- new features: mean from the particle pose, cov = Gz R Gz'.
    mi = new.astype(jnp.int32)
    pos = n + jnp.cumsum(mi) - mi
    ok = new & (pos < cap)
    r, bb = z[:, 0], z[:, 1]
    s = jnp.sin(pose[2] + bb)
    c = jnp.cos(pose[2] + bb)
    g00, g01 = c, -r * s
    g10, g11 = s, r * c
    gr00 = g00 * R[0, 0] + g01 * R[1, 0]
    gr01 = g00 * R[0, 1] + g01 * R[1, 1]
    gr10 = g10 * R[0, 0] + g11 * R[1, 0]
    gr11 = g10 * R[0, 1] + g11 * R[1, 1]
    w00 = gr00 * g00 + gr01 * g01
    w01 = gr00 * g10 + gr01 * g11
    w11 = gr10 * g10 + gr11 * g11
    En = ((pos[:, None] == slots[None, :]) & ok[:, None]).astype(dtype)
    fm = fm + jnp.stack(
        [scatter(En, pose[0] + r * c),
         scatter(En, pose[1] + r * s)], axis=-1
    )
    hit_n = En.sum(0) > 0
    q00 = jnp.where(hit_n, scatter(En, w00),
                    jnp.where(hit, q00, p00a))
    q01 = jnp.where(hit_n, scatter(En, w01),
                    jnp.where(hit, q01, p01a))
    q11 = jnp.where(hit_n, scatter(En, w11),
                    jnp.where(hit, q11, p11a))
    fP = jnp.stack(
        [jnp.stack([q00, q01], -1), jnp.stack([q01, q11], -1)], -2
    )

    # --- evidence counters (scatter-free, same one-hot masks).
    active = slots < n
    cnt = cnt + (Em.sum(0)).astype(cnt.dtype)            # +1 per match
    cnt = jnp.where(hit_n, 2, cnt)                       # fresh feature
    if sensor_range is not None:
        dxv = fm[:, 0] - pose[0]
        dyv = fm[:, 1] - pose[1]
        front = dxv * jnp.cos(pose[2]) + dyv * jnp.sin(pose[2]) > 0
        near = (dxv * dxv + dyv * dyv
                < (visibility_margin * sensor_range) ** 2)
        missed = active & front & near & ~hit & ~hit_n
        cnt = cnt - missed.astype(cnt.dtype)
    cnt = jnp.where(active | hit_n, cnt, 0)

    n = jnp.minimum(n + jnp.sum(mi, dtype=n.dtype), cap).astype(n.dtype)

    return fm, fP, n, cnt, dlogw.astype(dtype)


def measurement_update(st: PFState, z, z_mask, R, gate1, gate2,
                       sensor_range=None,
                       visibility_margin=0.85) -> PFState:
    """Vmapped per-particle association + map update + weight update."""
    fm, fP, n, cnt, dlogw = jax.vmap(
        lambda p, m, c, k, e: _particle_measurement(
            p, m, c, k, e, z, z_mask, R, gate1, gate2,
            sensor_range, visibility_margin,
        )
    )(st.poses, st.fm, st.fP, st.n, st.cnt)
    logw = st.logw + dlogw
    logw = logw - jax.scipy.special.logsumexp(logw)  # normalize
    return PFState(poses=st.poses, fm=fm, fP=fP, logw=logw, n=n, cnt=cnt)


def _particle_maintain(fm, fP, n, cnt, merge_r2, prune_below):
    """Prune + merge the map of ONE particle, scatter-free.

    Prune: drop features whose evidence counter fell below `prune_below`
    (negative information from expected-but-missed sightings).

    Merge: features whose means lie within sqrt(merge_r2) of each other are
    the same physical landmark seen twice (pose-sample drift spawned a
    duplicate past the new-feature gate).  Clusters form by transitive
    closure over the proximity graph — parent = lowest-index neighbor,
    resolved to roots by log2(cap) one-hot matrix squarings (pointer
    doubling; no dynamic gathers).  Members fuse by uniform covariance
    intersection: Lam = mean of member informations, eta = mean of member
    information-vectors — the mean is the information-weighted mean of the
    members while the covariance stays CONSERVATIVE (members are correlated
    — they come from the same vehicle track — so plain information addition
    would double-count; CI never under-states).  Surviving roots compact to
    the slot prefix with a one-hot permutation matmul; freed slots zero.

    Returns (fm, fP, n, cnt)."""
    cap = fm.shape[0]
    dtype = fm.dtype
    slots = jnp.arange(cap)
    keep = (slots < n) & (cnt >= prune_below)

    # Proximity graph over kept features (+ self loops for the argmax).
    d = fm[:, None, :] - fm[None, :, :]
    d2 = (d * d).sum(-1)
    A = (d2 <= merge_r2) & keep[:, None] & keep[None, :]
    A = A | jnp.eye(cap, dtype=bool)
    parent = jnp.argmax(A, axis=0)            # lowest-index neighbor <= j

    # Pointer doubling: M[j, i] = [parent^(2^k)(j) == i].
    M = (parent[:, None] == slots[None, :]).astype(dtype)
    for _ in range(max(1, int(math.ceil(math.log2(cap))))):
        M = jax.lax.dot(M, M, precision=_HI)  # 0/1 exact in f32
    root = jnp.argmax(M, axis=1)

    # Per-root member sums (uniform covariance intersection).
    W = M * keep[:, None].astype(dtype)       # (j, i) membership
    mcount = W.sum(0)                         # members per root slot
    p00, p01, p11 = fP[:, 0, 0], fP[:, 0, 1], fP[:, 1, 1]
    det = p00 * p11 - p01 * p01
    det = jnp.where(keep, det, 1.0)
    l00 = jnp.where(keep, p11 / det, 0.0)
    l01 = jnp.where(keep, -p01 / det, 0.0)
    l11 = jnp.where(keep, p00 / det, 0.0)
    e0 = l00 * fm[:, 0] + l01 * fm[:, 1]
    e1 = l01 * fm[:, 0] + l11 * fm[:, 1]
    comp = jnp.stack([l00, l01, l11, e0, e1, cnt.astype(dtype)], axis=-1)
    sums = jax.lax.dot(W.T, comp, precision=_HI)       # (cap, 6)
    m_safe = jnp.maximum(mcount, 1.0)
    L00, L01, L11 = sums[:, 0] / m_safe, sums[:, 1] / m_safe, sums[:, 2] / m_safe
    E0, E1 = sums[:, 3] / m_safe, sums[:, 4] / m_safe
    detL = jnp.where(mcount > 0, L00 * L11 - L01 * L01, 1.0)
    mrg_x = (L11 * E0 - L01 * E1) / detL
    mrg_y = (L00 * E1 - L01 * E0) / detL
    mrg_p00 = L11 / detL
    mrg_p01 = -L01 / detL
    mrg_p11 = L00 / detL

    # Singleton roots keep their original values bit-exactly (no inverse
    # round trip); only true merges (>= 2 members) take the CI result.
    one = mcount <= 1.5
    fx = jnp.where(one, fm[:, 0], mrg_x)
    fy = jnp.where(one, fm[:, 1], mrg_y)
    q00 = jnp.where(one, p00, mrg_p00)
    q01 = jnp.where(one, p01, mrg_p01)
    q11 = jnp.where(one, p11, mrg_p11)
    cnt_m = jnp.where(one, cnt.astype(dtype), sums[:, 5])

    # Compact surviving roots to the slot prefix (one-hot permutation).
    is_root = keep & (root == slots)
    new_pos = jnp.cumsum(is_root.astype(jnp.int32)) - is_root.astype(jnp.int32)
    C = ((new_pos[None, :] == slots[:, None]) & is_root[None, :]).astype(dtype)
    packed = jax.lax.dot(
        C, jnp.stack([fx, fy, q00, q01, q11, cnt_m], axis=-1), precision=_HI
    )
    fm = packed[:, :2]
    fP = jnp.stack(
        [jnp.stack([packed[:, 2], packed[:, 3]], -1),
         jnp.stack([packed[:, 3], packed[:, 4]], -1)], -2
    )
    cnt = jnp.round(packed[:, 5]).astype(cnt.dtype)
    n = jnp.sum(is_root, dtype=n.dtype)
    return fm, fP, n, cnt


def maintain_maps(st: PFState, merge_radius: float,
                  prune_below: int = 0) -> PFState:
    """Per-particle map maintenance: prune negative-evidence features and
    merge near-coincident duplicates (see _particle_maintain).  Purely
    per-particle — shards trivially over the particle axis."""
    fm, fP, n, cnt = jax.vmap(
        lambda m, c, k, e: _particle_maintain(
            m, c, k, e, merge_radius * merge_radius, prune_below
        )
    )(st.fm, st.fP, st.n, st.cnt)
    return st._replace(fm=fm, fP=fP, n=n, cnt=cnt)


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
        cnt=st.cnt[idx],
    )


def estimate_pose(st: PFState):
    """Weighted mean pose (circular mean for the heading)."""
    w = jnp.exp(st.logw - jax.scipy.special.logsumexp(st.logw))
    # precision pin: the default TPU matmul path would run this reduction
    # in bf16 — at ~100 m coordinates that is 0.1-0.5 m of error injected
    # into every reported pose estimate.
    xy = jnp.einsum("p,pk->k", w, st.poses[:, :2], precision=_HI)
    sphi = jnp.sum(w * jnp.sin(st.poses[:, 2]))
    cphi = jnp.sum(w * jnp.cos(st.poses[:, 2]))
    return jnp.concatenate([xy, jnp.arctan2(sphi, cphi)[None]])
