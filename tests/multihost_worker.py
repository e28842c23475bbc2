"""Multi-host worker: one PROCESS of an emulated 2-host cluster.

Launched by tests/test_multihost.py as `python multihost_worker.py
<process_id> <num_processes> <port> <outdir>`.  Each process brings up 4
virtual CPU devices and joins a jax.distributed cluster (localhost
coordinator), so the 8-device mesh SPANS PROCESS BOUNDARIES — the same
topology as a 2-host TPU pod over DCN (parallel/multihost.py), with gloo
standing in for the cross-host fabric.

Runs (a) the sharded closed-loop EKF sim and (b) one sharded grid-BA GN
solve on the host-spanning (particle, map) mesh; process 0 saves results
for the pytest process to compare against its single-process 8-device run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

N_EPOCHS = 30
BA_ITERS = 8


def put(mesh, spec):
    import numpy as np
    from jax.sharding import NamedSharding

    def f(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
        )

    return f


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid,
    )
    jax.config.update("jax_enable_x64", True)
    assert jax.device_count() == 4 * nproc
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpuslam.config import course1_config
    from tpuslam.graph.ba_sharded import (
        make_sharded_gauss_newton,
        partition_ba_problem,
        problem_specs,
    )
    from tpuslam.parallel.ekf_sharded import to_dense
    from tpuslam.parallel.multihost import make_multihost_mesh
    from tpuslam.parallel.sim_sharded import (
        init_sharded_sim_state,
        make_sharded_run,
        sim_state_specs,
    )
    from tpuslam.sim.scene import load_course, make_landmarks
    from tpuslam.sim.simulator import draw_noise_arrays
    from tests.test_ba import circle_problem, to_jnp

    # 'map' innermost (would ride ICI on hardware), 'particle' across the
    # two processes (DCN axis) — multihost.py's prescribed layout.
    mesh = make_multihost_mesh(map_per_host=4)
    assert mesh.devices.shape == (nproc, 4)

    # ---- (a) sharded closed-loop EKF sim (identical setup to
    # tests/test_sim_sharded.py so results are directly comparable).
    cfg = course1_config(n_landmarks=16, capacity=24, max_obs=16)
    wp = load_course()
    lm = make_landmarks(cfg.scene, seed=5)
    noises = draw_noise_arrays(cfg, N_EPOCHS, cfg.scene.n_landmarks, seed=13)

    st0 = init_sharded_sim_state(
        cfg, jnp.asarray(wp, jnp.float64), dtype=jnp.float64
    )
    sp = sim_state_specs("map")
    st0g = jax.tree.map(
        lambda x, s: put(mesh, s)(x), st0, sp,
        is_leaf=lambda x: isinstance(x, P),
    )
    repl = put(mesh, P())
    run = make_sharded_run(cfg, mesh)
    st, recs = run(repl(np.asarray(wp, np.float64)),
                   repl(np.asarray(lm, np.float64)),
                   st0g,
                   tuple(repl(n) for n in noises))
    dense = jax.jit(to_dense, out_shardings=NamedSharding(mesh, P()))(st.ekf)
    dense = jax.block_until_ready(dense)

    # ---- (b) one sharded grid-BA Gauss-Newton solve on the same mesh.
    prob, tp, tl = circle_problem(K=10, M=24, seed=2)
    part = to_jnp(partition_ba_problem(prob, 4))
    partg = jax.tree.map(
        lambda x, s: put(mesh, s)(x), part, problem_specs(),
        is_leaf=lambda x: isinstance(x, P),
    )
    ba_run = make_sharded_gauss_newton(mesh, BA_ITERS)
    got = ba_run(partg)
    got = jax.block_until_ready(jax.jit(
        lambda p: p, out_shardings=NamedSharding(mesh, P())
    )(got))

    if pid == 0:
        np.savez(
            os.path.join(outdir, "multihost.npz"),
            x=np.asarray(dense.x),
            P=np.asarray(dense.P),
            n=int(dense.n),
            slam_pose=np.asarray(recs.slam_pose),
            true_pose=np.asarray(recs.true_pose),
            active=np.asarray(recs.active),
            ba_poses=np.asarray(got.poses),
            ba_landmarks=np.asarray(got.landmarks),
        )
    print(f"[worker {pid}] OK", flush=True)


if __name__ == "__main__":
    main()
