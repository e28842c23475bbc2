"""Build BA problems from simulated runs (keyframe extraction).

Host-side setup code: samples keyframes along a simulated trajectory,
generates noisy odometry + range-bearing measurements with known landmark
ids (BA consumes an association; online association is the filter's job),
and packs them into a fixed-capacity BAProblem.
"""

from __future__ import annotations

import numpy as np

from tpuslam.graph.ba import BAProblem


def simulate_ba_problem(
    true_poses,            # (K, 3) keyframe ground truth
    true_landmarks,        # (M, 2) ground truth
    sensor_range: float,
    sigma_odo=(0.05, 0.05, 0.01),
    sigma_obs=(0.1, np.pi / 180.0),
    pose_init_noise=(0.5, 0.5, 0.05),
    lm_init_noise=0.5,
    max_obs_factors: int | None = None,
    seed: int = 0,
    dtype=np.float64,
):
    """Generate a noisy BA problem whose ground truth is known.

    Observations: every (keyframe, landmark) pair within sensor range and
    the front half-plane (same visibility rule as the sensor sim,
    sim/sim-utils.jl:12-28).
    """
    rng = np.random.default_rng(seed)
    tp = np.asarray(true_poses, dtype)
    tl = np.asarray(true_landmarks, dtype)
    K, M = len(tp), len(tl)

    # Odometry chain between consecutive keyframes (local frame).
    oi = np.arange(K - 1)
    oj = oi + 1
    meas = []
    for i in range(K - 1):
        c, s = np.cos(tp[i, 2]), np.sin(tp[i, 2])
        d = tp[i + 1, :2] - tp[i, :2]
        dphi = (tp[i + 1, 2] - tp[i, 2] + np.pi) % (2 * np.pi) - np.pi
        meas.append([c * d[0] + s * d[1], -s * d[0] + c * d[1], dphi])
    odo_meas = np.asarray(meas, dtype) + rng.standard_normal((K - 1, 3)) * sigma_odo

    # Observation factors via the native grid index (C++ with NumPy
    # fallback, tpuslam/native): every (keyframe, landmark) pair within
    # sensor acceptance, emitted keyframe-major / landmark-ascending.
    from tpuslam.native import SpatialIndex

    index = SpatialIndex(tl, cell_size=sensor_range)
    budget = max_obs_factors or K * M
    noise = rng.standard_normal((budget, 2))
    op, ol, oz = index.ba_factors(
        tp, sensor_range, noise, sigma_obs[0], sigma_obs[1], cap=budget
    )
    Fz = len(op)
    cap = max_obs_factors or Fz
    obs_p = np.zeros(cap, np.int32)
    obs_l = np.zeros(cap, np.int32)
    obs_z = np.zeros((cap, 2), dtype)
    obs_mask = np.zeros(cap, bool)
    take = min(Fz, cap)
    obs_p[:take] = op[:take]
    obs_l[:take] = ol[:take]
    obs_z[:take] = oz[:take]
    obs_mask[:take] = True

    # Noisy initial guesses.
    poses0 = tp + rng.standard_normal((K, 3)) * pose_init_noise
    poses0[0] = tp[0]  # anchored
    lms0 = tl + rng.standard_normal((M, 2)) * lm_init_noise

    prob = BAProblem(
        poses=poses0,
        landmarks=lms0,
        lm_mask=np.ones(M, bool),
        odo_i=oi.astype(np.int32),
        odo_j=oj.astype(np.int32),
        odo_meas=odo_meas,
        odo_mask=np.ones(K - 1, bool),
        odo_sqrt_info=np.diag(1.0 / np.asarray(sigma_odo, dtype)),
        obs_p=obs_p,
        obs_l=obs_l,
        obs_z=obs_z,
        obs_mask=obs_mask,
        obs_sqrt_info=np.diag(1.0 / np.asarray(sigma_obs, dtype)),
        prior_sqrt_info=np.eye(3, dtype=dtype) * 1e3,
    )
    return prob, tp, tl
