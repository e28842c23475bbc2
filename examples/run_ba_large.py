#!/usr/bin/env python
"""Million-landmark bundle adjustment demo (the grid BA scale path).

Builds a synthetic loop-course BA instance with `--landmarks` landmarks
observed from `--poses` keyframes, runs damped Gauss-Newton with
landmark Schur elimination in the scatter-free landmark-major grid
layout (graph/ba_large.py), and reports convergence + accuracy.
With --sharded the landmark axis is split over the device mesh (one
psum of the reduced pose system per iteration).

  python examples/run_ba_large.py                       # 100k landmarks
  python examples/run_ba_large.py --landmarks 1000000   # the headline run
  python examples/run_ba_large.py --sharded             # mesh over devices
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", type=int, default=100_000)
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--obs-per-landmark", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from tpuslam.graph.ba_large import (
        gauss_newton_grid,
        grid_cost,
        make_grid_ba_problem,
        make_sharded_gauss_newton_grid,
    )

    n_dev = len(jax.devices())
    lcm = args.chunk * (n_dev if args.sharded else 1)
    m_pad = ((args.landmarks + lcm - 1) // lcm) * lcm
    t0 = time.time()
    prob, tp, tl = make_grid_ba_problem(
        args.landmarks, args.poses, args.obs_per_landmark,
        extent=2000.0, seed=args.seed, pad_to=m_pad,
    )
    print(f"problem: {args.landmarks} landmarks (padded {m_pad}), "
          f"{args.poses} poses, {args.landmarks * args.obs_per_landmark} "
          f"observation factors  [built in {time.time() - t0:.1f}s]")

    c0 = float(grid_cost(prob))
    t0 = time.time()
    if args.sharded:
        from tpuslam.parallel.mesh import make_slam_mesh

        mesh = make_slam_mesh(n_map=n_dev)
        run = make_sharded_gauss_newton_grid(mesh, args.iters,
                                             chunk=args.chunk)
        out = jax.block_until_ready(run(prob))
        cf = float(grid_cost(out))
    else:
        out, cf = gauss_newton_grid(prob, args.iters, chunk=args.chunk)
        out = jax.block_until_ready(out)
        cf = float(cf)
    dt = time.time() - t0

    lm_err = np.linalg.norm(
        np.asarray(out.landmarks)[: args.landmarks] - np.asarray(tl), axis=1
    )
    pose_err = np.linalg.norm(
        np.asarray(out.poses)[:, :2] - np.asarray(tp)[:, :2], axis=1
    )
    print(f"{args.iters} GN iters in {dt:.2f}s (incl. compile): "
          f"cost {c0:.3e} -> {cf:.3e}")
    print(f"median landmark err {np.median(lm_err):.3f} m, "
          f"mean pose err {pose_err.mean():.3f} m")


if __name__ == "__main__":
    main()
