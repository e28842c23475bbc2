"""Accuracy / consistency metrics.

The reference records true and SLAM tracks side by side every tick
(sim/ekfslam-sim.jl:126-128, src/common.jl:9-10) but computes no metric from
them — these are the metrics BASELINE.json requires on that hook.
"""

from __future__ import annotations

import numpy as np


def ate_rmse(slam_track, true_track) -> float:
    """Absolute trajectory error (RMSE over xy positions).

    Both tracks (T, 3) poses aligned in time; no Umeyama alignment — the
    reference filter is anchored at the true initial pose
    (sim/ekfslam-sim.jl:42), so frames coincide by construction.
    """
    slam = np.asarray(slam_track)[:, :2]
    true = np.asarray(true_track)[:, :2]
    err = np.linalg.norm(slam - true, axis=1)
    return float(np.sqrt(np.mean(err**2)))


def pose_nees(slam_pose, true_pose, P_pose) -> np.ndarray:
    """Per-step normalized estimation error squared of the xy position.

    Chi-square consistency: for a consistent filter, mean NEES over Monte
    Carlo runs is near the state dimension (2 here).
    """
    e = np.asarray(slam_pose)[:, :2] - np.asarray(true_pose)[:, :2]
    out = np.empty(len(e))
    for t in range(len(e)):
        out[t] = e[t] @ np.linalg.solve(P_pose[t][:2, :2], e[t])
    return out
