"""Multi-host (emulated) execution test — VERDICT r1 next-step #3.

Spawns TWO separate Python processes, each with 4 virtual CPU devices,
joined via jax.distributed (localhost coordinator, gloo collectives).  The
8-device (particle=2, map=4) mesh built by multihost.make_multihost_mesh
spans the process boundary — the same mesh/collective topology as a 2-host
TPU pod (map axis within a host = ICI, particle axis across hosts = DCN).

Asserts that the sharded closed-loop EKF sim and the sharded grid-BA
Gauss-Newton produce the SAME numbers as this (single-process, 8-device)
pytest process.
"""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import course1_config
from tpuslam.sim.scene import load_course, make_landmarks
from tpuslam.sim.simulator import draw_noise_arrays, init_sim_state, run_epochs

from tests.multihost_worker import BA_ITERS, N_EPOCHS

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_result(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=_REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return np.load(os.path.join(outdir, "multihost.npz"))


def test_multihost_ekf_matches_single_process(multihost_result):
    """2-process host-spanning mesh == single-process dense engine (f64)."""
    mh = multihost_result
    cfg = course1_config(n_landmarks=16, capacity=24, max_obs=16)
    wp = jnp.asarray(load_course(), jnp.float64)
    lm = jnp.asarray(make_landmarks(cfg.scene, seed=5), jnp.float64)
    noises = draw_noise_arrays(cfg, N_EPOCHS, cfg.scene.n_landmarks, seed=13)

    st, recs = run_epochs(
        cfg, wp, lm, init_sim_state(cfg, wp, dtype=jnp.float64),
        tuple(jnp.asarray(n, jnp.float64) for n in noises),
    )
    np.testing.assert_array_equal(mh["active"], np.asarray(recs.active))
    np.testing.assert_allclose(
        mh["slam_pose"], np.asarray(recs.slam_pose), atol=1e-7
    )
    assert int(mh["n"]) == int(st.ekf.n)
    np.testing.assert_allclose(mh["x"], np.asarray(st.ekf.x), atol=1e-7)
    np.testing.assert_allclose(mh["P"], np.asarray(st.ekf.P), atol=1e-7)


def test_multihost_ba_matches_single_process(multihost_result):
    """Sharded BA over the host-spanning mesh == dense GN on the same
    partitioned problem."""
    from tpuslam.graph.ba import gauss_newton
    from tpuslam.graph.ba_sharded import partition_ba_problem

    from tests.test_ba import circle_problem, to_jnp

    mh = multihost_result
    prob, tp, tl = circle_problem(K=10, M=24, seed=2)
    part = to_jnp(partition_ba_problem(prob, 4))
    want, _ = gauss_newton(part, BA_ITERS)
    np.testing.assert_allclose(
        mh["ba_poses"], np.asarray(want.poses), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        mh["ba_landmarks"], np.asarray(want.landmarks), rtol=1e-7, atol=1e-9
    )
