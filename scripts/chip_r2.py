#!/usr/bin/env python
"""Round-2 real-chip measurement driver (VERDICT r1 #1b, #2, #6).

Runs on the real TPU (default backend).  Each stage prints one JSON line
and flushes, so a partial run still yields data.  Stages:

  dense   — fused dense-engine ms/epoch at cap 1024..8192 with the NEW
            per-kernel impl dispatch + auto precision (vs r1 PERF numbers).
  bigcap  — sharded engine at multi-GB Pmm on a 1-device mesh:
            cap 16384 f32 (4.3 GB), 24576 f32 (9.7 GB), 32768 fp16 (8.6 GB).
  pf      — FastSLAM accuracy (100p) + 10k-particle sharded throughput.

Usage: python scripts/chip_r2.py [stage ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def stage_dense():
    import jax.numpy as jnp

    from tpuslam.bench.harness import landmark_sweep

    for row in landmark_sweep(caps=(1024, 2048, 4096, 8192), n_epochs=12):
        emit(stage="dense", **{k: round(float(v), 4)
                               for k, v in row.items()})


def stage_config2():
    """THE cap-1024 headline, measured on bench.py's exact scene
    (bench.harness.config2_setup) with the same marginal methodology —
    reconciles the r2 PERF/BENCH disagreement (VERDICT r2 weak #4)."""
    from tpuslam.bench.harness import config2_setup, ekf_throughput

    cfg, wp, lm = config2_setup()
    ticks, upd, ms = ekf_throughput(cfg, wp, lm, 100)
    emit(stage="config2", capacity=cfg.capacity, max_obs=cfg.max_obs,
         ms_per_epoch=round(ms, 4), ticks_per_s=round(ticks, 1),
         updates_per_s=round(upd, 1))


def stage_bigcap():
    import jax.numpy as jnp

    from tpuslam.bench.harness import sharded_bigcap_throughput

    for cap, mdt in ((8192, None), (16384, None), (24576, None),
                     (32768, jnp.float16)):
        try:
            r = sharded_bigcap_throughput(cap, n_map=1, n_epochs=4,
                                          map_dtype=mdt)
            emit(stage="bigcap",
                 map_dtype=str(mdt.__name__ if mdt else "float32"),
                 **{k: round(float(v), 4) for k, v in r.items()})
        except Exception as e:  # OOM at the largest sizes is informative
            emit(stage="bigcap", capacity=cap,
                 map_dtype=str(mdt.__name__ if mdt else "float32"),
                 error=f"{type(e).__name__}: {str(e)[:200]}")


def stage_pf():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.bench.harness import fastslam_accuracy, fastslam_throughput
    from tpuslam.config import course1_config
    from tpuslam.sim.scene import load_course, make_landmarks

    cfg = course1_config(n_landmarks=35, capacity=64, max_obs=48)
    wp = load_course()
    lm = make_landmarks(cfg.scene, seed=3)

    for n_p in (100, 1000, 10000):
        acc = fastslam_accuracy(cfg, wp, lm, n_p, 1100, seed=0)
        emit(stage="pf_accuracy", n_particles=n_p,
             **{k: round(float(v), 4) for k, v in acc.items()})

    # 10k-particle SHARDED path on the real chip (1-device mesh): the
    # parity anchor for the dense 10k number in PERF.md.
    from tpuslam.parallel.fastslam_sharded import (
        init_pf_sharded_sim_state,
        make_sharded_pf_run,
    )
    from tpuslam.parallel.mesh import make_slam_mesh
    from tpuslam.utils.profiling import marginal_ms

    mesh = make_slam_mesh(n_particle=1)
    n_ep = 30
    runners = {n: make_sharded_pf_run(cfg, mesh, n, 10000)
               for n in (n_ep, 3 * n_ep)}
    wpj = jnp.asarray(wp, jnp.float32)
    lmj = jnp.asarray(lm, jnp.float32)
    st0 = init_pf_sharded_sim_state(cfg, wpj, 10000, jax.random.key(0))

    def run(n, seed):
        out = runners[n](wpj, lmj, st0, jax.random.key(seed))
        jax.block_until_ready(out)
        np.asarray(out[0].pf.poses[0, 0])

    ms = marginal_ms(run, n_ep, 3 * n_ep)
    emit(stage="pf_sharded_10k", ms_per_epoch=round(ms, 3),
         ticks_per_s=round(cfg.substeps_per_obs / (ms / 1e3), 1))


STAGES = {"dense": stage_dense, "config2": stage_config2,
          "bigcap": stage_bigcap, "pf": stage_pf}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    import jax

    dev = jax.devices()[0]
    emit(stage="env", platform=dev.platform, kind=dev.device_kind)
    for nm in names:
        STAGES[nm]()
    emit(stage="done")
