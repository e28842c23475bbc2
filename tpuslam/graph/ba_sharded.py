"""Distributed bundle adjustment: landmark blocks sharded over the 'map'
mesh axis, Gauss-Newton with the Schur complement psum-reduced.

Exactly the collective pattern of the distributed EKF update
(parallel/ekf_sharded.py): each shard eliminates ITS landmarks (2x2 block
inverses + per-shard contribution to the reduced 3K x 3K pose system), one
psum assembles the reduced system, the small pose solve is replicated, and
landmark back-substitution is local.  Per GN iteration: ONE psum of
(3K x 3K + 3K); no other cross-shard traffic.

Factors are pre-partitioned by landmark owner on the host
(partition_ba_problem) so every shard's factor slice references only its
own landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from tpuslam.core.geometry import mpi_to_pi
from tpuslam.graph.ba import (
    BAProblem,
    _pose_only_terms,
    _schur_terms,
)

_HI = lax.Precision.HIGHEST

AXIS = "map"


def problem_specs(axis: str = AXIS) -> BAProblem:
    """Landmarks + observation factors sharded; poses/odometry replicated."""
    return BAProblem(
        poses=P(), landmarks=P(axis), lm_mask=P(axis),
        odo_i=P(), odo_j=P(), odo_meas=P(), odo_mask=P(), odo_sqrt_info=P(),
        obs_p=P(axis), obs_l=P(axis), obs_z=P(axis), obs_mask=P(axis),
        obs_sqrt_info=P(), prior_sqrt_info=P(),
    )


def partition_ba_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side repack: sort observation factors by owning shard and pad
    each shard's slice to a common capacity; landmark count padded to a
    multiple of n_shards.  Factor landmark indices stay GLOBAL (the shard
    kernel localizes them with its axis offset)."""
    M = prob.landmarks.shape[0]
    M_pad = ((M + n_shards - 1) // n_shards) * n_shards
    m_local = M_pad // n_shards

    lm = np.zeros((M_pad, 2), np.asarray(prob.landmarks).dtype)
    lm[:M] = prob.landmarks
    lmask = np.zeros(M_pad, bool)
    lmask[:M] = prob.lm_mask

    obs_l = np.asarray(prob.obs_l)
    obs_mask = np.asarray(prob.obs_mask)
    owner = obs_l // m_local
    per_shard = [
        np.nonzero(obs_mask & (owner == s))[0] for s in range(n_shards)
    ]
    cap = max((len(ix) for ix in per_shard), default=0)
    cap = max(cap, 1)

    def pack(arr, fill=0):
        arr = np.asarray(arr)
        out = np.full((n_shards * cap,) + arr.shape[1:], fill, arr.dtype)
        for s, ix in enumerate(per_shard):
            out[s * cap: s * cap + len(ix)] = arr[ix]
        return out

    new_mask = np.zeros(n_shards * cap, bool)
    for s, ix in enumerate(per_shard):
        new_mask[s * cap: s * cap + len(ix)] = True

    return prob._replace(
        landmarks=lm,
        lm_mask=lmask,
        obs_p=pack(prob.obs_p),
        obs_l=pack(prob.obs_l),
        obs_z=pack(prob.obs_z),
        obs_mask=new_mask,
    )


def _gn_step_shard(prob: BAProblem, damping, *, axis: str = AXIS):
    """One GN step; prob holds the LOCAL landmark/factor slices."""
    K = prob.poses.shape[0]
    m_local = prob.landmarks.shape[0]
    b = lax.axis_index(axis)

    # Localize factor landmark indices.
    local = prob._replace(obs_l=prob.obs_l - b * m_local)

    Hpp_o, bp_o = _pose_only_terms(prob.poses, prob)
    Hpp_red_b, bp_red_b, bl, Hll_inv, G2 = _schur_terms(
        local.poses, local.landmarks, local, damping
    )
    # Each shard contributed its obs-factor Hpp part and its landmarks'
    # Schur couplings — additive, so ONE psum assembles the reduced system.
    Hpp_red, bp_red = lax.psum((Hpp_red_b, bp_red_b), axis)

    H = Hpp_o + Hpp_red + damping * jnp.eye(3 * K, dtype=prob.poses.dtype)
    dp = jnp.linalg.solve(H, -(bp_o + bp_red))

    Gdp = jnp.einsum("mkd,d->mk", G2, dp, precision=_HI)
    dl = jnp.einsum("mkl,ml->mk", Hll_inv, -bl - Gdp, precision=_HI)

    poses = prob.poses + dp.reshape(K, 3)
    poses = poses.at[:, 2].set(mpi_to_pi(poses[:, 2]))
    lm = prob.landmarks + dl * prob.lm_mask[:, None]
    return prob._replace(poses=poses, landmarks=lm)


def make_sharded_gauss_newton(mesh, iters: int, damping: float = 1e-6,
                              axis: str = AXIS):
    sp = problem_specs(axis)

    def run(prob):
        def body(p, _):
            return _gn_step_shard(p, damping, axis=axis), ()

        prob, _ = lax.scan(body, prob, None, length=iters)
        return prob

    return jax.jit(
        jax.shard_map(
            run, mesh=mesh, in_specs=(sp,), out_specs=sp, check_vma=False
        )
    )
