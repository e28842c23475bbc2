#!/usr/bin/env python
"""FastSLAM (Rao-Blackwellized particle filter) on course1 — the algorithm
the reference declares but never implements (README.md:6).

  python examples/run_fastslam.py [--particles 100] [--landmarks 15]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100)
    ap.add_argument("--landmarks", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=350)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default="/tmp/fastslam.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.bench.metrics import ate_rmse
    from tpuslam.config import course1_config
    from tpuslam.sim.pf_simulator import init_pf_sim_state, run_epochs_pf
    from tpuslam.sim.scene import load_course, make_landmarks
    from tpuslam.viz.mpl import ScenePlotter

    cfg = course1_config(n_landmarks=args.landmarks)
    waypoints = load_course()
    landmarks = make_landmarks(cfg.scene, seed=args.seed)
    wp = jnp.asarray(waypoints, jnp.float32)
    lm = jnp.asarray(landmarks, jnp.float32)

    st0 = init_pf_sim_state(cfg, wp, args.particles,
                            jax.random.key(args.seed + 1))
    st, recs = run_epochs_pf(cfg, wp, lm, st0, args.epochs,
                             jax.random.key(args.seed + 2))

    act = np.asarray(recs.active).reshape(-1)
    tt = np.asarray(recs.true_pose).reshape(-1, 3)[act]
    ss = np.asarray(recs.slam_pose).reshape(-1, 3)[act]

    plot = ScenePlotter(cfg.scene.boundaries, waypoints, landmarks)
    plot.update(tt, ss)
    # Best particle's map.
    best = int(np.argmax(np.asarray(st.pf.logw)))
    nb = int(np.asarray(st.pf.n)[best])
    fm = np.asarray(st.pf.fm)[best, :nb]
    if nb:
        plot.est_lm.set_data(fm[:, 0], fm[:, 1])
    plot.save(args.out)
    print(f"{act.sum()} ticks; particles {args.particles}; "
          f"best-particle landmarks {nb}; "
          f"ATE {ate_rmse(ss, tt):.3f} m; figure -> {args.out}")


if __name__ == "__main__":
    main()
