#!/usr/bin/env python
"""FastSLAM closed-loop quality vs particle count, multi-seed (real chip).

VERDICT r2 weak #3: the r2 table was single-seed, non-monotone in
particles (1 000 worse than 100), and saturated its map slots with
duplicates.  This reruns the full 2-lap course1 accuracy study WITH the
round-3 per-particle map maintenance (merge + evidence pruning) over
several seeds, so the particle-count trend is separable from noise.

Usage: python scripts/pf_quality_tpu.py [seeds] [particle counts ...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from tpuslam.bench.harness import fastslam_accuracy
    from tpuslam.config import course1_config
    from tpuslam.sim.scene import load_course, make_landmarks

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    counts = [int(a) for a in sys.argv[2:]] or [100, 1000, 10000]

    dev = jax.devices()[0]
    print(json.dumps({"stage": "env", "platform": dev.platform,
                      "kind": dev.device_kind}), flush=True)

    cfg = course1_config(n_landmarks=35, capacity=64, max_obs=48)
    wp = load_course()
    lm = make_landmarks(cfg.scene, seed=3)

    for n_p in counts:
        rows = []
        for seed in range(n_seeds):
            acc = fastslam_accuracy(cfg, wp, lm, n_p, 1100, seed=seed)
            rows.append(acc)
            print(json.dumps({"stage": "pf_seed", "n_particles": n_p,
                              "seed": seed,
                              **{k: round(float(v), 3)
                                 for k, v in acc.items()}}), flush=True)
        med = {k: round(float(np.median([r[k] for r in rows])), 3)
               for k in rows[0]}
        print(json.dumps({"stage": "pf_summary", "n_particles": n_p,
                          "n_seeds": n_seeds, **med}), flush=True)


if __name__ == "__main__":
    main()
