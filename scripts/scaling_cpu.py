#!/usr/bin/env python
"""Virtual-mesh scaling rows (VERDICT r1 next-step #1a).

Runs the sharded closed-loop engine on an 8-virtual-device CPU mesh at
n_map = 1/2/4/8 and prints one JSON line per row (ms/epoch + efficiency).
This is a CODE-PATH and same-host proxy — CPU collectives are not ICI; the
ICI/DCN prediction lives in tpuslam/bench/comm_model.py, anchored by the
real-chip single-shard measurements (PERF.md).

Invoked as a subprocess by `bench.py --full` (the bench process itself is
bound to the TPU backend; the virtual CPU mesh needs its own process).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np

    from tpuslam.bench.harness import sharded_scaling
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.sim.scene import make_grid_course, make_landmarks

    caps = [int(c) for c in (sys.argv[1].split(",") if len(sys.argv) > 1
                             else ["1024", "2048"])]
    for cap in caps:
        extent = max(200.0, 0.3 * cap)
        scene = SceneConfig(
            xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
            n_landmarks=cap, legacy_integer_landmarks=False,
        )
        cfg = SimConfig(scene=scene, capacity=cap, max_obs=32)
        wp = make_grid_course(extent, 5)
        lm = make_landmarks(scene, seed=4)
        n_ep = max(6, 2048 // cap * 6)
        rows = sharded_scaling(cfg, wp, lm, map_sizes=(1, 2, 4, 8),
                               n_epochs=n_ep)
        base = rows[0]["ms_per_epoch"]
        for r in rows:
            # All virtual devices share one physical CPU, so wall time per
            # epoch should stay ~FLAT as n_map grows (total work is fixed);
            # 'overhead_vs_1shard' isolates what sharding adds (collectives
            # + per-shard bookkeeping).  Real strong-scaling numbers need
            # real chips; comm_model.py predicts those from these anchors.
            print(json.dumps({
                "capacity": cap,
                "n_map": r["n_map"],
                "ms_per_epoch": round(float(r["ms_per_epoch"]), 3),
                "overhead_vs_1shard": round(
                    float(r["ms_per_epoch"] / base), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
