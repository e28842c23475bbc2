#!/usr/bin/env python
"""Stand-in ablation of the closed-loop epoch (default cap 1024; pass
`cap=4096` etc. for the big-cap attribution — VERDICT r2 weak #2).

At cap 1024 the covariance passes account for only ~60 us of the measured
~450 us epoch — this attributes the rest.  Methodology per PERF.md
("measurement pitfalls"): ablate the FULL program by replacing ONE phase
with a cheap shape-preserving fake (monkeypatched), never by truncating
outputs (DCE lies).  Each variant gets fresh n_epochs values so the
static-arg jit cache cannot serve a stale (unpatched) executable.

Variants:
  full        — baseline
  cheap_ticks — vehicle_tick + predict_accumulate replaced by ~free fakes
                (leaves the 9-iteration scan structure: what remains of
                the tick phase is loop/launch overhead)
  no_assoc    — pair_scores returns a huge constant (scoring ablated;
                downstream masked work unchanged)
  no_blocks   — predicted_assoc_blocks returns zeros (small-block algebra
                for association ablated)
  no_obs      — get_observations returns a pose-dependent constant
  no_fused    — fused_epoch_apply returns x-only update, P untouched
                (ablates the whole measurement+covariance phase)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tpuslam.assoc.nn as nn
    import tpuslam.filters.ekf_fused as ef
    import tpuslam.sim.simulator as simmod
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.sim.scene import make_grid_course, make_landmarks
    from tpuslam.sim.simulator import init_sim_state

    cap = 1024
    want = []
    for tok in sys.argv[1:]:
        if tok.startswith("cap="):
            cap = int(tok[4:])
        else:
            want.append(tok)

    if cap == 1024:
        # Historical cap-1024 config (keeps continuity with the r2 rows).
        extent, n_lm, max_obs, n_side, inset = 300.0, 1000, 48, 6, 0.1
    else:
        # Match bench.harness.landmark_sweep exactly — the config whose
        # measured ms/epoch (PERF "Closed-loop throughput") this ablation
        # attributes.
        extent = max(200.0, 0.4 * cap)
        n_lm, max_obs, n_side, inset = cap, 32, 5, 0.05
    scene = SceneConfig(xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
                        n_landmarks=n_lm, legacy_integer_landmarks=False)
    cfg = SimConfig(scene=scene, capacity=cap, max_obs=max_obs)
    wp = jnp.asarray(make_grid_course(extent, n_per_side=n_side,
                                      inset=inset), jnp.float32)
    lm = jnp.asarray(make_landmarks(scene, seed=4), jnp.float32)
    st0 = init_sim_state(cfg, wp, dtype=jnp.float32)
    print(json.dumps({"stage": "env", "capacity": cap,
                      "kind": jax.devices()[0].device_kind}), flush=True)

    orig = dict(
        vehicle_tick=simmod.vehicle_tick,
        predict_accumulate=simmod.predict_accumulate,
        pair_scores=nn.pair_scores,
        predicted_assoc_blocks=ef.predicted_assoc_blocks,
        get_observations=simmod.get_observations,
        fused_epoch_apply=ef.fused_epoch_apply,
    )

    def fake_vehicle_tick(cfg_, waypoints, veh, ctrl_noise):
        eps = 1e-7 * (ctrl_noise[0] + ctrl_noise[1])
        veh2 = veh._replace(pose=veh.pose + eps)
        return veh2, cfg_.vehicle.target_speed + eps, veh.gamma + eps, \
            veh.waypoint_id != -1

    def fake_predict_accumulate(acc, v, g, wheelbase, Q, dt):
        pose, Gt, Qacc = acc
        eps = 1e-9 * (v + g)
        return (pose + eps, Gt, Qacc + eps)

    def fake_pair_scores(pose, features, P33, P3f, Pff, z, z_mask,
                         slot_active, R):
        nz, capn = z.shape[0], features.shape[0]
        dep = 1e-9 * (jnp.sum(z) + jnp.sum(pose) + jnp.sum(Pff[0]))
        big = jnp.full((nz, capn), 1e9, z.dtype) + dep
        return big, big

    def fake_blocks(state, Gt, Qacc):
        capn = state.features.shape[0]
        dep = 1e-9 * jnp.sum(Gt)
        return (jnp.eye(3, dtype=state.x.dtype) + dep,
                jnp.zeros((capn, 3, 2), state.x.dtype),
                jnp.tile(jnp.eye(2, dtype=state.x.dtype)[None], (capn, 1, 1)))

    def fake_get_observations(pose, landmarks, sensor_range, obs_noise,
                              max_obs):
        dep = 1e-9 * (pose[0] + jnp.sum(obs_noise[0]))
        z = jnp.tile(jnp.asarray([10.0, 0.1], pose.dtype), (max_obs, 1)) + dep
        return z, jnp.ones((max_obs,), bool), \
            jnp.zeros((max_obs,), jnp.int32)

    def fake_fused_apply(state, pose_pred, Gt, Qacc, z, matched, new, idf,
                         R, upd_active):
        dep = 1e-9 * (jnp.sum(z) + jnp.sum(Gt) + jnp.sum(Qacc))
        x = state.x.at[:3].set(pose_pred + dep)
        return state._replace(x=x)

    variants = {
        "full": {},
        "unroll9": {},   # candidate FIX, not an ablation: tick scan unroll
        "cheap_ticks": {"vehicle_tick": fake_vehicle_tick,
                        "predict_accumulate": fake_predict_accumulate},
        "no_assoc": {"pair_scores": fake_pair_scores},
        "no_blocks": {"predicted_assoc_blocks": fake_blocks},
        "no_obs": {"get_observations": fake_get_observations},
        "no_fused": {"fused_epoch_apply": fake_fused_apply},
    }
    import dataclasses as _dc

    cfg_of = {"unroll9": _dc.replace(cfg, tick_unroll=cfg.substeps_per_obs)}

    if want:  # optional subset of variant names
        unknown = [w for w in want if w not in variants]
        if unknown:
            sys.exit(f"unknown variant(s) {unknown}; "
                     f"valid: {sorted(variants)} (plus cap=<int>)")
        variants = {k: v for k, v in variants.items() if k in want}

    for vi, (name, patches) in enumerate(variants.items()):
        cfg_v = cfg_of.get(name, cfg)
        for k, v in patches.items():
            mod = (simmod if k in ("vehicle_tick", "predict_accumulate",
                                   "get_observations")
                   else nn if k == "pair_scores" else ef)
            setattr(mod, k, v)
        try:
            # Fresh static n_epochs per variant defeats the jit cache.
            n1, n2 = 40 + vi, 3 * (40 + vi)

            def run(n, seed):
                st, recs = simmod.run_epochs_rng(
                    cfg_v, wp, lm, st0, n, jax.random.key(seed))
                jax.block_until_ready(st)
                np.asarray(st.ekf.x[0])

            run(n1, 1000)
            run(n2, 1001)

            def best(n, s0):
                ts = []
                for i in range(3):
                    t0 = time.perf_counter()
                    run(n, s0 + i)
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            ms = (best(n2, 1) - best(n1, 100)) / (n2 - n1) * 1e3
            print(json.dumps({"variant": name,
                              "ms_per_epoch": round(ms, 4)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:160]}),
                  flush=True)
        finally:
            for k in patches:
                mod = (simmod if k in ("vehicle_tick", "predict_accumulate",
                                       "get_observations")
                       else nn if k == "pair_scores" else ef)
                setattr(mod, k, orig[k])


if __name__ == "__main__":
    main()
