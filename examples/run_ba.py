#!/usr/bin/env python
"""Pose-graph / bundle-adjustment demo: simulate a drifting keyframe
trajectory with loop closure, optimize with Gauss-Newton + landmark Schur
elimination (optionally landmark-sharded over the device mesh).

  python examples/run_ba.py [--keyframes 40] [--landmarks 120] [--sharded]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=40)
    ap.add_argument("--landmarks", type=int, default=120)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.graph.ba import gauss_newton, total_cost
    from tpuslam.graph.keyframes import simulate_ba_problem

    rng = np.random.default_rng(args.seed)
    th = np.linspace(0, 2 * np.pi, args.keyframes)
    tp = np.stack([60 * np.cos(th), 60 * np.sin(th), th + np.pi / 2], -1)
    tl = rng.uniform(-90, 90, (args.landmarks, 2))
    prob, tp, tl = simulate_ba_problem(tp, tl, sensor_range=45.0,
                                       seed=args.seed)
    probj = jax.tree.map(jnp.asarray, prob)

    c0 = float(total_cost(probj))
    init_err = np.linalg.norm(
        np.asarray(prob.poses)[:, :2] - tp[:, :2], axis=1).mean()

    if args.sharded:
        from tpuslam.graph.ba_sharded import (
            make_sharded_gauss_newton,
            partition_ba_problem,
        )
        from tpuslam.parallel.mesh import make_slam_mesh

        n = min(8, len(jax.devices()))
        part = jax.tree.map(jnp.asarray, partition_ba_problem(prob, n))
        out = make_sharded_gauss_newton(make_slam_mesh(n_map=n),
                                        args.iters)(part)
        cf = float(total_cost(out))
        mode = f"sharded x{n}"
    else:
        out, cf = gauss_newton(probj, args.iters)
        cf = float(cf)
        mode = "dense"

    err = np.linalg.norm(
        np.asarray(out.poses)[:, :2] - tp[:, :2], axis=1).mean()
    print(f"[{mode}] cost {c0:.1f} -> {cf:.1f}; "
          f"mean pose error {init_err:.2f} -> {err:.2f} m over "
          f"{args.keyframes} keyframes / {args.landmarks} landmarks")


if __name__ == "__main__":
    main()
