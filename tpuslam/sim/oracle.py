"""Pure-NumPy float64 oracle for golden-trajectory tests.

A pinned, dynamically-shaped, sequential implementation of *exactly* the math
in the reference (every function cites src file:line) — the test suite runs
the TPU-native engine and this oracle on the identical pregenerated noise
stream and asserts trajectory agreement (SURVEY.md section 4).

Deliberately mirrors the reference's structure (growing state vector, row
loops, in-place style) — this file is the spec executable, not the product.
Two documented deviations from the Julia original, shared with the engine so
the comparison stays exact:
  * noise is indexed per-landmark / per-tick from pregenerated arrays instead
    of drawn from a global RNG at the point of use (distribution-identical);
  * the observation list is capped at max_obs (the engine's static buffer);
    scenarios are sized so the cap never binds.
"""

from __future__ import annotations

import numpy as np


def mpi_to_pi(phi: float) -> float:
    # Ref src/common.jl:102-110 (single-branch wrap).
    if phi > np.pi:
        return phi - 2 * np.pi
    if phi < -np.pi:
        return phi + 2 * np.pi
    return phi


def predict_observation(x: np.ndarray, idf: int):
    # Ref src/common.jl:139-165.  idf 0-based; returns z (2,), dense H (2, n).
    fpos = 3 + 2 * idf
    dx = x[fpos] - x[0]
    dy = x[fpos + 1] - x[1]
    d2 = dx * dx + dy * dy
    d = np.sqrt(d2)
    z = np.array([d, np.arctan2(dy, dx) - x[2]])
    xd, yd = dx / d, dy / d
    xd2, yd2 = dx / d2, dy / d2
    H = np.zeros((2, len(x)))
    H[:, 0:3] = [[-xd, -yd, 0.0], [yd2, -xd2, -1.0]]
    H[:, fpos:fpos + 2] = [[xd, yd], [-yd2, xd2]]
    return z, H


def ekf_predict(x, P, v, g, wheelbase, Q, dt):
    # Ref src/ekf.jl:8-43 (uses measured speed/gamma).
    phi = x[2]
    s, c = np.sin(g + phi), np.cos(g + phi)
    vts, vtc = v * dt * s, v * dt * c
    Gv = np.array([[1, 0, -vts], [0, 1, vtc], [0, 0, 1]])
    Gu = np.array(
        [[dt * c, -vts],
         [dt * s, vtc],
         [dt * np.sin(g) / wheelbase, v * dt * np.cos(g) / wheelbase]]
    )
    P = P.copy()
    P[0:3, 0:3] = Gv @ P[0:3, 0:3] @ Gv.T + Gu @ Q @ Gu.T
    if P.shape[0] > 3:
        P[0:3, 3:] = Gv @ P[0:3, 3:]
        P[3:, 0:3] = P[0:3, 3:].T
    x = x.copy()
    x[0:3] = [x[0] + vtc, x[1] + vts,
              mpi_to_pi(phi + v * dt * np.sin(g) / wheelbase)]
    return x, P


def ekf_update(x, P, zf, R, idf):
    # Ref src/ekf.jl:46-77.  zf: (nz, 2) rows; idf: list of 0-based indices.
    nz = len(idf)
    if nz == 0:
        return x, P
    n = len(x)
    H = np.zeros((2 * nz, n))
    v = np.zeros(2 * nz)
    RR = np.zeros((2 * nz, 2 * nz))
    for i in range(nz):
        zp, H[2 * i:2 * i + 2, :] = predict_observation(x, idf[i])
        v[2 * i] = zf[i, 0] - zp[0]
        v[2 * i + 1] = mpi_to_pi(zf[i, 1] - zp[1])
        RR[2 * i:2 * i + 2, 2 * i:2 * i + 2] = R
    PHt = P @ H.T
    S = H @ PHt + RR
    S = 0.5 * (S + S.T)
    L = np.linalg.cholesky(S)            # S = L L^T
    W1 = np.linalg.solve(L, PHt.T).T     # PHt L^-T
    W = np.linalg.solve(L.T, W1.T).T     # W1 L^-1 = PHt S^-1
    x = x + W @ v
    P = P - W1 @ W1.T
    return x, P


def ekf_add_features(x, P, zn, R):
    # Ref src/ekf.jl:84-122 (sequential append).  zn: (k, 2) rows.
    for i in range(zn.shape[0]):
        n = len(x)
        r, b = zn[i, 0], zn[i, 1]
        phi = x[2]
        s, c = np.sin(phi + b), np.cos(phi + b)
        x = np.concatenate([x, [x[0] + r * c, x[1] + r * s]])
        Gv = np.array([[1, 0, -r * s], [0, 1, r * c]])
        Gz = np.array([[c, -r * s], [s, r * c]])
        P2 = np.zeros((n + 2, n + 2))
        P2[:n, :n] = P
        rng = slice(n, n + 2)
        P2[rng, rng] = Gv @ P[0:3, 0:3] @ Gv.T + Gz @ R @ Gz.T
        P2[rng, 0:3] = Gv @ P[0:3, 0:3]
        P2[0:3, rng] = P2[rng, 0:3].T
        if n > 3:
            P2[rng, 3:n] = Gv @ P[0:3, 3:n]
            P2[3:n, rng] = P2[rng, 3:n].T
        P = P2
    return x, P


def compute_association(x, P, z, R, idf):
    # Ref src/data-association.jl:53-63.
    zp, H = predict_observation(x, idf)
    v = z - zp
    v[1] = mpi_to_pi(v[1])
    S = H @ P @ H.T + R
    nis = v @ np.linalg.solve(S, v)
    nd = nis + np.log(np.linalg.det(S))
    return nis, nd


def associate(x, P, z, R, gate1, gate2):
    # Ref src/data-association.jl:1-51 — sequential semantics verbatim,
    # including the order-dependent `outer` bookkeeping.
    nf = (len(x) - 3) // 2
    zf, zn, idf = [], [], []
    for i in range(z.shape[0]):
        jbest = -1
        nbest = np.inf
        outer = np.inf
        for j in range(nf):
            nis, nd = compute_association(x, P, z[i], R, j)
            ingate = nis < gate1 and nd < nbest
            if ingate:
                nbest = nd
                jbest = j
            elif nis < outer:
                outer = nis
        if jbest >= 0:
            zf.append(z[i])
            idf.append(jbest)
        elif outer > gate2:
            zn.append(z[i])
    return (np.array(zf).reshape(-1, 2), idf,
            np.array(zn).reshape(-1, 2))


def steer(pose, gamma, iwp, waypoints, d_min, dt, steer_rate, max_gamma):
    # Ref src/common.jl:189-230.  iwp 0-based; -1 = finished.
    x, y, phi = pose
    cwp = waypoints[iwp]
    if (cwp[0] - x) ** 2 + (cwp[1] - y) ** 2 < d_min**2:
        iwp += 1
        if iwp >= len(waypoints):
            return gamma, -1
        cwp = waypoints[iwp]
    dg = mpi_to_pi(np.arctan2(cwp[1] - y, cwp[0] - x) - phi - gamma)
    dgmax = steer_rate * dt
    if abs(dg) > dgmax:
        dg = np.sign(dg) * dgmax
    gamma += dg
    if abs(gamma) > max_gamma:
        gamma = np.sign(gamma) * max_gamma
    return gamma, iwp


def step_vehicle(pose, speed, gamma, wheelbase, dt):
    # Ref src/common.jl:172-181 (target controls).
    x, y, phi = pose
    return np.array(
        [x + speed * dt * np.cos(gamma + phi),
         y + speed * dt * np.sin(gamma + phi),
         mpi_to_pi(phi + speed * dt * np.sin(gamma) / wheelbase)]
    )


def get_observations(pose, landmarks, sensor_range, obs_noise, max_obs):
    # Ref sim/sim-utils.jl:12-75, with per-landmark noise indexing and the
    # max_obs cap (see module docstring).
    dx = landmarks[:, 0] - pose[0]
    dy = landmarks[:, 1] - pose[1]
    phi = pose[2]
    vis = ((dx * np.cos(phi) + dy * np.sin(phi)) > 0) & (
        dx * dx + dy * dy < sensor_range**2
    )
    idx = np.nonzero(vis)[0][:max_obs]
    d = np.sqrt(dx[idx] ** 2 + dy[idx] ** 2)
    bearing = np.arctan2(dy[idx], dx[idx]) - phi
    z = np.stack([d, bearing], axis=-1) + obs_noise[idx]
    return z, idx


def run_sim(cfg, waypoints, landmarks, ctrl_noise, obs_noise):
    """Full closed-loop oracle run (ref sim/ekfslam-sim.jl:49-143).

    cfg: tpuslam.config.SimConfig.  ctrl_noise: (E, substeps, 2) scaled;
    obs_noise: (E, n_landmarks, 2) scaled.

    Returns dict with true_track, slam_track (nsteps, 3), final x, P.
    """
    vc, nc = cfg.vehicle, cfg.noise
    waypoints = np.asarray(waypoints, np.float64)
    landmarks = np.asarray(landmarks, np.float64)
    Q = np.diag(nc.Q)
    R = np.diag(nc.R)

    # ekfsim_setup (ekfslam-sim.jl:17-45)
    phi0 = np.arctan2(waypoints[1, 1] - waypoints[0, 1],
                      waypoints[1, 0] - waypoints[0, 0])
    pose = np.array([waypoints[0, 0], waypoints[0, 1], phi0])
    x = pose.copy()
    P = np.zeros((3, 3))
    gamma = 0.0
    iwp = 0
    nlaps = cfg.nlaps

    true_track, slam_track = [], []
    n_epochs = ctrl_noise.shape[0]
    done = False
    for e in range(n_epochs):
        for s in range(cfg.substeps_per_obs):
            if iwp == -1:
                done = True
                break
            gamma, iwp = steer(pose, gamma, iwp, waypoints, cfg.d_min,
                               cfg.dt, vc.steer_rate, vc.max_gamma)
            if iwp == -1 and nlaps > 1:
                iwp = 0
                nlaps -= 1
            pose = step_vehicle(pose, vc.target_speed, gamma, vc.wheelbase,
                                cfg.dt)
            v_m = vc.target_speed + ctrl_noise[e, s, 0]
            g_m = gamma + ctrl_noise[e, s, 1]
            x, P = ekf_predict(x, P, v_m, g_m, vc.wheelbase, Q, cfg.dt)

            if s == cfg.substeps_per_obs - 1:
                z, _ = get_observations(pose, landmarks, vc.sensor_range,
                                        obs_noise[e], cfg.max_obs)
                zf, idf, zn = associate(x, P, z, R, cfg.gate_assoc,
                                        cfg.gate_newfeat)
                x, P = ekf_update(x, P, zf, R, idf)
                x, P = ekf_add_features(x, P, zn, R)

            true_track.append(pose.copy())
            slam_track.append(x[0:3].copy())
        if done:
            break

    return {
        "true_track": np.array(true_track),
        "slam_track": np.array(slam_track),
        "x": x,
        "P": P,
    }
