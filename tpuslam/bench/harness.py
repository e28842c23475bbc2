"""Benchmark harness: the measurements BASELINE.json requires.

  * closed-loop throughput (ticks/s, updates/s) vs landmark count
  * FastSLAM particle-filter throughput (config 3)
  * ATE on course1 (config 1) — bench.py's health gate
  * Monte-Carlo NEES consistency
  * sharded scaling (per-epoch time vs map-axis size on a mesh)

All timings use marginal two-size differencing with fresh PRNG keys per
call (this stack caches identical dispatches and has tens-of-ms fixed
dispatch overhead — see bench.py).
"""

from __future__ import annotations



import numpy as np


def _marginal_time(run, n1, n2):
    """min-of-2 marginal seconds-per-unit between run(n1) and run(n2)."""
    from tpuslam.utils.profiling import marginal_ms

    return marginal_ms(run, n1, n2) / 1e3


def config2_setup(capacity: int = 1024, n_landmarks: int = 1000,
                  extent: float = 300.0, max_obs: int = 48, seed: int = 4):
    """THE config-2 scene (BASELINE config 2: 1k landmarks, 1 chip).

    bench.py's headline and scripts/chip_r2.py's dense sweep both build
    the scene through here so 'the cap-1024 number' is ONE number: the r2
    documents disagreed (0.45 vs 0.601 ms/epoch) because the sweep used a
    sparser 410 m scene with max_obs 32 while the bench used this 300 m /
    max_obs 48 scene — max_obs sets the update-panel width m2 = 2*max_obs
    and with it most of the per-epoch cost.  Returns (cfg, wp, lm)."""
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.sim.scene import make_grid_course, make_landmarks

    scene = SceneConfig(
        xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
        n_landmarks=n_landmarks, legacy_integer_landmarks=False,
    )
    cfg = SimConfig(scene=scene, capacity=capacity, max_obs=max_obs)
    wp = make_grid_course(extent, n_per_side=6, inset=0.1)
    lm = make_landmarks(scene, seed=seed)
    return cfg, wp, lm


def ekf_throughput(cfg, waypoints, landmarks, n_epochs, dtype=None):
    """Closed-loop EKF-SLAM: returns (ticks/s, updates/s, ms/epoch)."""
    import jax
    import jax.numpy as jnp

    from tpuslam.sim.simulator import init_sim_state, run_epochs_rng

    dtype = dtype or jnp.float32
    wp = jnp.asarray(waypoints, dtype)
    lm = jnp.asarray(landmarks, dtype)
    st0 = init_sim_state(cfg, wp, dtype=dtype)

    def run(n, seed):
        out = run_epochs_rng(cfg, wp, lm, st0, n, jax.random.key(seed))
        jax.block_until_ready(out)
        np.asarray(out[0].ekf.x[0])

    per_epoch = _marginal_time(run, n_epochs, 3 * n_epochs)
    return (cfg.substeps_per_obs / per_epoch, 1.0 / per_epoch,
            per_epoch * 1e3)


def fastslam_throughput(cfg, waypoints, landmarks, n_particles, n_epochs,
                        dtype=None):
    """FastSLAM RBPF closed loop: returns (ticks/s, ms/epoch)."""
    import jax
    import jax.numpy as jnp

    from tpuslam.sim.pf_simulator import init_pf_sim_state, run_epochs_pf

    dtype = dtype or jnp.float32
    wp = jnp.asarray(waypoints, dtype)
    lm = jnp.asarray(landmarks, dtype)
    st0 = init_pf_sim_state(cfg, wp, n_particles, jax.random.key(0),
                            dtype=dtype)

    def run(n, seed):
        out = run_epochs_pf(cfg, wp, lm, st0, n, jax.random.key(seed))
        jax.block_until_ready(out)
        np.asarray(out[0].pf.poses[0, 0])

    per_epoch = _marginal_time(run, n_epochs, 3 * n_epochs)
    return cfg.substeps_per_obs / per_epoch, per_epoch * 1e3


def landmark_sweep(caps=(64, 256, 1024), n_epochs=30, extent_per_cap=0.4):
    """updates/s and ticks/s vs landmark count (BASELINE metric set).

    Scene area scales with capacity to keep the visible-landmark count
    (and max_obs) roughly constant."""
    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.sim.scene import make_grid_course, make_landmarks

    rows = []
    for cap in caps:
        extent = max(200.0, extent_per_cap * cap)
        scene = SceneConfig(
            xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
            n_landmarks=cap, legacy_integer_landmarks=False,
        )
        cfg = SimConfig(scene=scene, capacity=cap, max_obs=32)
        wp = make_grid_course(extent, 5)
        lm = make_landmarks(scene, seed=4)
        # Small caps need more epochs per run: the marginal signal must
        # exceed the tunnel's ms-scale timing noise.
        n_ep = n_epochs * max(1, 1024 // cap)
        ticks, upd, ms = ekf_throughput(cfg, wp, lm, n_ep)
        rows.append({"capacity": cap, "ticks_per_s": ticks,
                     "updates_per_s": upd, "ms_per_epoch": ms})
    return rows


def ba_large_throughput(n_landmarks=1_000_000, n_poses=64, n_obs=4,
                        iters_per_call=2, chunk=8192, seed=0,
                        dtype=None):
    """Large-scale grid BA (BASELINE config 5 shape): GN iterations/s at
    `n_landmarks` on the current device(s).

    Returns (ms_per_gn_iter, cost0, cost_final, median_lm_err).  Timing is
    marginal between 1 and 3 chained calls of one compiled executable
    (chaining feeds the optimized problem back in, so inputs differ and
    the dispatch cache cannot serve a stale result).
    """
    import time

    import jax
    import numpy as np

    from tpuslam.graph.ba_large import (
        gauss_newton_grid,
        make_grid_ba_problem,
    )

    dtype = dtype or np.float32
    M_pad = ((n_landmarks + chunk - 1) // chunk) * chunk
    prob, tp, tl = make_grid_ba_problem(
        n_landmarks, n_poses, n_obs, extent=2000.0, seed=seed,
        pad_to=M_pad, dtype=dtype,
    )

    def run(n_calls):
        p = prob
        t0 = time.time()
        for _ in range(n_calls):
            p, _ = gauss_newton_grid(p, iters_per_call, chunk=chunk,
                                     with_cost=False)
        jax.block_until_ready(p)
        np.asarray(p.poses[0])
        return time.time() - t0, p

    run(1)                                   # compile + warm
    t1 = min(run(1)[0] for _ in range(2))
    t3, p3 = run(3)
    t3b, _ = run(3)
    t3 = min(t3, t3b)
    per_iter = (t3 - t1) / (2 * iters_per_call)

    from tpuslam.graph.ba_large import grid_cost

    c0 = float(grid_cost(prob))
    c3 = float(grid_cost(p3))
    lm_err = np.linalg.norm(
        np.asarray(p3.landmarks)[:n_landmarks] - np.asarray(tl), axis=1
    )
    return per_iter * 1e3, c0, c3, float(np.median(lm_err))


def fastslam_accuracy(cfg, waypoints, landmarks, n_particles, n_epochs,
                      seed=0, dtype=None):
    """FastSLAM closed-loop accuracy (VERDICT r1 #6): ATE of the
    weighted-mean pose estimate + map quality of the max-weight particle.

    Returns {"ate", "n_landmarks", **map_quality}."""
    import jax
    import jax.numpy as jnp

    from tpuslam.bench.metrics import ate_rmse, map_quality
    from tpuslam.sim.pf_simulator import init_pf_sim_state, run_epochs_pf

    dtype = dtype or jnp.float32
    wp = jnp.asarray(waypoints, dtype)
    lm = jnp.asarray(landmarks, dtype)
    st0 = init_pf_sim_state(cfg, wp, n_particles, jax.random.key(seed),
                            dtype=dtype)
    st, recs = jax.block_until_ready(
        run_epochs_pf(cfg, wp, lm, st0, n_epochs, jax.random.key(seed + 1))
    )
    a = np.asarray(recs.active).reshape(-1)
    tt = np.asarray(recs.true_pose).reshape(-1, 3)[a]
    ss = np.asarray(recs.slam_pose).reshape(-1, 3)[a]
    best = int(np.argmax(np.asarray(st.pf.logw)))
    nb = int(np.asarray(st.pf.n)[best])
    est = np.asarray(st.pf.fm)[best, :nb]
    mq = map_quality(est, np.asarray(lm))
    return {"ate": float(ate_rmse(ss, tt)), "n_landmarks": nb, **mq}


def sharded_bigcap_throughput(cap, n_map=None, max_obs=48, n_epochs=4,
                              map_dtype=None, dtype=None):
    """Sharded engine at multi-GB covariance on the real device(s)
    (VERDICT r1 #1b: the sharded path's reason to exist is Pmm too large
    for comfort on one chip; demonstrate it at scale).

    Builds a synthetic already-full map state (cap active landmarks — the
    worst case: every Pmm row live) and times the fused sharded epoch.
    Returns {"capacity", "pmm_gb", "ms_per_epoch", "updates_per_s"}."""
    import jax
    import jax.numpy as jnp

    from tpuslam.config import SceneConfig, SimConfig
    from tpuslam.parallel.mesh import make_slam_mesh
    from tpuslam.parallel.sim_sharded import make_sharded_run_rng
    from tpuslam.sim.scene import make_grid_course, make_landmarks

    from tpuslam.core.geometry import initial_pose
    from tpuslam.parallel.ekf_sharded import BlockEKFState
    from tpuslam.parallel.sim_sharded import ShardedSimState
    from tpuslam.sim.simulator import VehicleState

    dtype = dtype or jnp.float32
    map_dtype = map_dtype or dtype
    n_map = n_map or len(jax.devices())
    extent = max(200.0, 0.1 * cap)
    scene = SceneConfig(
        xmin=0.0, xmax=extent, ymin=0.0, ymax=extent,
        n_landmarks=min(cap, 4096), legacy_integer_landmarks=False,
    )
    cfg = SimConfig(scene=scene, capacity=cap, max_obs=max_obs)
    wp = jnp.asarray(make_grid_course(extent, 4), dtype)
    lm = jnp.asarray(make_landmarks(scene, seed=4), dtype)
    mesh = make_slam_mesh(n_map=n_map)

    # Build the block state DIRECTLY at capacity (init_sharded_sim_state
    # goes through a dense (3+2cap)^2 intermediate — prohibitive at
    # multi-GB Pmm).  Every slot pre-activated with a 0.1*I marginal on a
    # uniform grid: the worst case, every Pmm row live in the epoch's
    # covariance algebra.  Pmm is generated on-device already sharded.
    pose = np.asarray(initial_pose(np.asarray(wp)))
    side = int(np.ceil(np.sqrt(cap)))
    gx, gy = np.meshgrid(np.linspace(0, extent, side),
                         np.linspace(0, extent, side))
    fm = np.stack([gx.ravel(), gy.ravel()], -1)[:cap].astype(np.float32)
    pmm_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("map", None))
    # The full state is built per timed call (build_state below) so the
    # only live copy is the one the runner donates.
    fm_np = fm.astype(np.float32)

    @jax.jit
    def _build_state(p_veh, p_ekf):
        # Fresh state (EVERY leaf a new buffer) per timed call so the
        # runner can DONATE it: without donation XLA must hold the input
        # Pmm AND the output Pmm (plus the f32 delta on the fp16/XLA
        # fallback path) — 2-3x the map buffer, the difference between
        # cap 20480 and cap 32768 fitting in 16 GB HBM.  Donation flags
        # the whole pytree, so leaves must not share buffers (pose is
        # used twice) nor be reused across calls (the donated template
        # would be dead on call 2).  The rebuild is device-side and its
        # cost cancels in the two-run-size marginal.
        Pmm = jax.lax.with_sharding_constraint(
            0.1 * jnp.eye(2 * cap, dtype=map_dtype), pmm_sharding)
        veh = VehicleState(
            pose=p_veh, gamma=jnp.zeros((), dtype),
            waypoint_id=jnp.zeros((), jnp.int32),
            nlaps=jnp.asarray(cfg.nlaps, jnp.int32),
        )
        ekf = BlockEKFState(
            pose=p_ekf,
            fm=jnp.asarray(fm_np, dtype),
            Ppp=jnp.zeros((3, 3), dtype),
            Ppm=jnp.zeros((3, 2 * cap), dtype),
            Pmm=Pmm,
            n=jnp.asarray(cap, jnp.int32),
        )
        return ShardedSimState(vehicle=veh, ekf=ekf)

    def build_state():
        # The two pose leaves come from two SEPARATE host->device
        # transfers made outside the jit: an arithmetic identity
        # (p + 0.0) inside it could be folded/CSE'd by XLA into one
        # buffer, silently degrading donation back to a copy
        # (advisor r3).
        return _build_state(jnp.asarray(np.asarray(pose), dtype),
                            jnp.asarray(np.asarray(pose), dtype))

    runner = make_sharded_run_rng(cfg, mesh, n_epochs)
    runner3 = make_sharded_run_rng(cfg, mesh, 3 * n_epochs)
    runner = jax.jit(runner, donate_argnums=(2,))
    runner3 = jax.jit(runner3, donate_argnums=(2,))

    donation_warnings: list = []

    def run(n, seed, _r={n_epochs: runner, 3 * n_epochs: runner3}):
        # A "donated buffer was not usable" warning means the 2-3x Pmm
        # memory saving silently regressed — surface it in the result
        # instead of letting it scroll by (advisor r3).
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = _r[n](wp, lm, build_state(), jax.random.key(seed))
            jax.block_until_ready(out)
            np.asarray(out[0].ekf.pose[0])
        donation_warnings.extend(
            str(x.message) for x in w if "donat" in str(x.message).lower())

    per_epoch = _marginal_time(run, n_epochs, 3 * n_epochs)
    pmm_gb = (2 * cap) ** 2 * jnp.dtype(map_dtype).itemsize / 2 ** 30
    return {"capacity": cap, "n_map": n_map, "pmm_gb": float(pmm_gb),
            "ms_per_epoch": per_epoch * 1e3,
            "updates_per_s": 1.0 / per_epoch,
            "n_donation_warnings": len(donation_warnings)}


def monte_carlo_nees(cfg, waypoints, landmarks, n_runs=20, n_epochs=30,
                     dtype=None, seed0=0):
    """Mean position NEES over Monte-Carlo runs at the final step.

    For a consistent filter E[NEES] == 2 (xy).  The filter starts at the
    true pose (ref ekfslam-sim.jl:42), so NEES is evaluated after enough
    epochs for covariance to develop."""
    import jax
    import jax.numpy as jnp

    from tpuslam.sim.simulator import init_sim_state, run_epochs_rng

    dtype = dtype or jnp.float32
    wp = jnp.asarray(waypoints, dtype)
    lm = jnp.asarray(landmarks, dtype)
    st0 = init_sim_state(cfg, wp, dtype=dtype)

    vals = []
    for r in range(n_runs):
        st, recs = run_epochs_rng(cfg, wp, lm, st0, n_epochs,
                                  jax.random.key(seed0 + r))
        e = (np.asarray(st.ekf.x[:2])
             - np.asarray(st.vehicle.pose[:2]))
        Pp = np.asarray(st.ekf.P[:2, :2])
        vals.append(float(e @ np.linalg.solve(Pp, e)))
    return float(np.mean(vals)), np.asarray(vals)


def sharded_scaling(cfg, waypoints, landmarks, map_sizes=(1, 2, 4, 8),
                    n_epochs=20, dtype=None):
    """Per-epoch time of the sharded closed loop vs 'map' axis size.

    On a real pod slice this measures ICI scaling of the Schur collectives;
    on the virtual CPU mesh it validates the code path and gives a
    same-host proxy."""
    import jax
    import jax.numpy as jnp

    from tpuslam.parallel.mesh import make_slam_mesh
    from tpuslam.parallel.sim_sharded import (
        init_sharded_sim_state,
        make_sharded_run_rng,
    )

    dtype = dtype or jnp.float32
    wp = jnp.asarray(waypoints, dtype)
    lm = jnp.asarray(landmarks, dtype)

    rows = []
    for n_map in map_sizes:
        if len(jax.devices()) < n_map or cfg.capacity % n_map:
            continue
        mesh = make_slam_mesh(n_map=n_map)
        runner = make_sharded_run_rng(cfg, mesh, n_epochs)
        runner3 = make_sharded_run_rng(cfg, mesh, 3 * n_epochs)
        st0 = init_sharded_sim_state(cfg, wp, dtype=dtype)

        def run(n, seed, _r={n_epochs: runner, 3 * n_epochs: runner3}):
            out = _r[n](wp, lm, st0, jax.random.key(seed))
            jax.block_until_ready(out)
            np.asarray(out[0].ekf.pose[0])

        per_epoch = _marginal_time(run, n_epochs, 3 * n_epochs)
        rows.append({"n_map": n_map, "ms_per_epoch": per_epoch * 1e3})
    if rows:
        base = rows[0]["ms_per_epoch"]
        for r in rows:
            r["efficiency"] = base / (r["ms_per_epoch"] * r["n_map"] /
                                      rows[0]["n_map"])
    return rows
