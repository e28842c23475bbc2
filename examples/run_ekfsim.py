#!/usr/bin/env python
"""EKF-SLAM simulation with the native plotting frontend — the analog of
the reference entry script sim/run-ekfsim.jl (GR window -> matplotlib).

  python examples/run_ekfsim.py [--landmarks 10] [--epochs 350]
                                [--out /tmp/ekfsim.png] [--frames DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=350)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ekfsim.png")
    ap.add_argument("--frames", default=None,
                    help="directory for per-epoch frame captures")
    ap.add_argument("--live", action="store_true",
                    help="interactive real-time window (the reference's "
                         "GR mode, run-ekfsim.jl:13-29); throttled to "
                         "real time like ekfslam-sim.jl:133-137")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.bench.metrics import ate_rmse
    from tpuslam.config import course1_config
    from tpuslam.core.ellipse import laser_lines
    from tpuslam.sim.scene import load_course, make_landmarks
    from tpuslam.sim.sensors import get_observations
    from tpuslam.sim.simulator import epoch, init_sim_state
    from tpuslam.viz.mpl import ScenePlotter

    cfg = course1_config(n_landmarks=args.landmarks)
    waypoints = load_course()
    landmarks = make_landmarks(cfg.scene, seed=args.seed)
    wp = jnp.asarray(waypoints, jnp.float32)
    lm = jnp.asarray(landmarks, jnp.float32)
    st = init_sim_state(cfg, wp, dtype=jnp.float32)

    sig_c = jnp.asarray([cfg.noise.sigma_speed, cfg.noise.sigma_steer],
                        jnp.float32)
    sig_o = jnp.asarray([cfg.noise.sigma_range, cfg.noise.sigma_bearing],
                        jnp.float32)

    @jax.jit
    def step(st, key):
        key, k1, k2 = jax.random.split(key, 3)
        ctrl = jax.random.normal(k1, (cfg.substeps_per_obs, 2),
                                 jnp.float32) * sig_c
        obs = jax.random.normal(k2, (lm.shape[0], 2), jnp.float32) * sig_o
        st2, recs = epoch(cfg, wp, lm, st, (ctrl, obs))
        z, z_mask, _ = get_observations(
            st2.vehicle.pose, lm, cfg.vehicle.sensor_range, obs, cfg.max_obs
        )
        return st2, key, recs, z, z_mask

    plot = ScenePlotter(cfg.scene.boundaries, waypoints, landmarks,
                        live=args.live)
    if args.live and not plot.live:
        print("no display/GUI backend — falling back to headless capture")
    import time

    epoch_wall = cfg.substeps_per_obs * cfg.dt  # real-time pacing target
    key = jax.random.key(args.seed + 1)
    tt, ss = [], []
    for e in range(args.epochs):
        t_mark = time.time()
        st, key, recs, z, z_mask = step(st, key)
        act = np.asarray(recs.active)
        tt.append(np.asarray(recs.true_pose)[act])
        ss.append(np.asarray(recs.slam_pose)[act])
        if int(st.vehicle.waypoint_id) == -1:
            break
        if plot.live or (args.frames and e % 10 == 0):
            zm = np.asarray(z_mask)
            lid = np.asarray(
                laser_lines(np.asarray(z)[zm], np.asarray(st.ekf.x[:3]))
            ) if zm.any() else None
            plot.update(np.concatenate(tt), np.concatenate(ss),
                        state=st.ekf, lidar=lid)
            if args.frames and e % 10 == 0:
                plot.save(os.path.join(args.frames, f"frame_{e:04d}.png"))
        if plot.live:
            # Sleep-to-deadline real-time throttle (ekfslam-sim.jl:133-137).
            plot.refresh(max(epoch_wall - (time.time() - t_mark), 1e-4))

    true_track = np.concatenate(tt)
    slam_track = np.concatenate(ss)
    plot.update(true_track, slam_track, state=st.ekf)
    plot.save(args.out)
    print(f"{len(true_track)} ticks; landmarks {int(st.ekf.n)}; "
          f"ATE {ate_rmse(slam_track, true_track):.3f} m; "
          f"figure -> {args.out}")


if __name__ == "__main__":
    main()
