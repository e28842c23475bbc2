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


def map_quality(est_landmarks, true_landmarks, match_radius: float = 2.0):
    """Map-quality metrics: duplicate-landmark rate and matched-landmark RMSE.

    The reference's gated-NN association (src/data-association.jl:42-48) can
    mint a duplicate feature when a re-observation's NIS clears gate2, so
    landmark count alone overstates map size.  Each estimated landmark is
    assigned to its nearest true landmark; an estimate farther than
    `match_radius` from every true landmark is *spurious*, and every estimate
    beyond the first claiming the same true landmark is a *duplicate*.

    Returns a dict:
      n_est, n_true      — estimated / true landmark counts
      n_matched_true     — distinct true landmarks covered by >=1 estimate
      n_duplicates       — extra estimates beyond the first per true landmark
      n_spurious         — estimates matching no true landmark
      duplicate_rate     — n_duplicates / max(n_est, 1)
      matched_rmse       — RMSE of matched estimate -> true distances [m]
      coverage           — n_matched_true / n_true
    """
    est = np.asarray(est_landmarks, np.float64).reshape(-1, 2)
    true = np.asarray(true_landmarks, np.float64).reshape(-1, 2)
    n_est, n_true = len(est), len(true)
    if n_est == 0 or n_true == 0:
        return {
            "n_est": n_est, "n_true": n_true, "n_matched_true": 0,
            "n_duplicates": 0, "n_spurious": n_est,
            "duplicate_rate": 0.0, "matched_rmse": float("nan"),
            "coverage": 0.0,
        }
    d = np.linalg.norm(est[:, None, :] - true[None, :, :], axis=-1)
    nearest = d.argmin(axis=1)
    dist = d[np.arange(n_est), nearest]
    matched = dist <= match_radius
    claimed = nearest[matched]
    uniq = np.unique(claimed)
    n_dup = int(matched.sum() - len(uniq))
    return {
        "n_est": n_est,
        "n_true": n_true,
        "n_matched_true": int(len(uniq)),
        "n_duplicates": n_dup,
        "n_spurious": int((~matched).sum()),
        "duplicate_rate": n_dup / max(n_est, 1),
        "matched_rmse": (float(np.sqrt(np.mean(dist[matched] ** 2)))
                         if matched.any() else float("nan")),
        "coverage": len(uniq) / n_true,
    }
