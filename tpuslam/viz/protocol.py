"""Telemetry message schema — wire-compatible with the reference browser
frontend (sim/browser/wsserver.jl:22-98, 120-136).

Outbound envelope: {"type": <name>, "data": ..., "timestamp": <unix time>}.
Message types and payload schemas (field names must not change — recipients
depend on them, wsserver.jl:92):

  waypoints / landmarks : [{"x", "y"}, ...]
  tracks                : {"ideal": {x,y,phi}, "slam": {x,y,phi}}
  state                 : {"pose": [x,y,phi], "cov": [[...]]}  (active part)
  lidar                 : [{"x1","y1","x2","y2"}, ...]
  feature-ellipses      : [{"cx","cy","rx","ry","phi"}, ...]
  vehicle-ellipse       : [{"cx","cy","vehicle_phi","rx","ry","phi"}]

Inbound (wsserver.jl:151-182): {"type":"request","text":
  "ready"|"start"|"reset"|"pause", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def envelope(name: str, data) -> str:
    return json.dumps(
        {"type": name, "data": data, "timestamp": time.time()}
    )


def xy_dicts(points) -> list:
    """(N, 2) -> [{"x", "y"}, ...]  (ref dict_array, wsserver.jl:120-136)."""
    return [{"x": float(p[0]), "y": float(p[1])} for p in np.asarray(points)]


def tracks_msg(true_pose, slam_pose) -> str:
    t = np.asarray(true_pose, float)
    s = np.asarray(slam_pose, float)
    return envelope("tracks", {
        "ideal": {"x": t[0], "y": t[1], "phi": t[2]},
        "slam": {"x": s[0], "y": s[1], "phi": s[2]},
    })


def state_msg(x, P, n_active: int) -> str:
    """Pose + the ACTIVE part of the joint covariance (the reference's cov
    is exactly the active size; we slice the fixed-capacity buffer)."""
    dim = 3 + 2 * n_active
    return envelope("state", {
        "pose": [float(v) for v in np.asarray(x[:3])],
        "cov": np.asarray(P[:dim, :dim], float).tolist(),
    })


def lidar_msg(lines) -> str:
    """(nz, 4) rows [vx vy fx fy] (core.ellipse.laser_lines)."""
    return envelope("lidar", [
        {"x1": float(l[0]), "y1": float(l[1]),
         "x2": float(l[2]), "y2": float(l[3])}
        for l in np.asarray(lines)
    ])


def _eig2(P):
    a, b, c = P[0, 0], P[0, 1], P[1, 1]
    tr, disc = a + c, np.sqrt(max(((a - c) / 2) ** 2 + b * b, 0.0))
    lam1, lam2 = tr / 2 + disc, tr / 2 - disc
    # Eigenvector angle of the *smaller-index* eigenvalue column to match
    # Julia's eig ordering (ascending): use lam2's vector like eig's u[:,1].
    if b != 0:
        v = np.array([lam2 - c, b])
    else:
        v = np.array([1.0, 0.0]) if a <= c else np.array([0.0, 1.0])
    phi = np.arctan2(v[1], v[0])
    return max(lam2, 0.0), max(lam1, 0.0), phi


def feature_ellipses_msg(x, P, n_active: int) -> str:
    """5-parameter eigen-ellipses per feature (ref wsserver.jl:72-85:
    [cx, cy, sqrt(l1), sqrt(l2), angle(u1)] with Julia's ascending eig)."""
    x = np.asarray(x, float)
    P = np.asarray(P, float)
    out = []
    for i in range(n_active):
        j = 3 + 2 * i
        l_small, l_big, phi = _eig2(P[j:j + 2, j:j + 2])
        out.append({
            "cx": x[j], "cy": x[j + 1],
            "rx": float(np.sqrt(l_small)), "ry": float(np.sqrt(l_big)),
            "phi": phi,
        })
    return envelope("feature-ellipses", out)


def vehicle_ellipse_msg(x, P) -> str:
    """Ref wsserver.jl:60-66: [pose; sqrt(eigvals); angle]."""
    x = np.asarray(x, float)
    l_small, l_big, phi = _eig2(np.asarray(P[:2, :2], float))
    return envelope("vehicle-ellipse", [{
        "cx": x[0], "cy": x[1], "vehicle_phi": x[2],
        "rx": float(np.sqrt(l_small)), "ry": float(np.sqrt(l_big)),
        "phi": phi,
    }])
