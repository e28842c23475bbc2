"""Checkpoint/resume round-trips for every engine state type."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import course1_config
from tpuslam.filters.fastslam import make_pf_state
from tpuslam.parallel.multihost import make_multihost_mesh
from tpuslam.sim.scene import load_course
from tpuslam.sim.simulator import init_sim_state, run_epochs_rng
from tpuslam.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture
def mid_run_state():
    cfg = course1_config(n_landmarks=10, capacity=16, max_obs=12)
    wp = jnp.asarray(load_course(), jnp.float32)
    lm = jnp.asarray(
        np.random.default_rng(0).uniform(10, 90, (10, 2)), jnp.float32
    )
    st0 = init_sim_state(cfg, wp, dtype=jnp.float32)
    st, _ = run_epochs_rng(cfg, wp, lm, st0, 20, jax.random.key(0))
    return cfg, wp, lm, st


def assert_tree_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_npz_roundtrip_sim_state(tmp_path, mid_run_state):
    cfg, wp, lm, st = mid_run_state
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, st)
    st2 = load_checkpoint(path, st)
    assert_tree_equal(st, st2)


def test_resume_continues_identically(tmp_path, mid_run_state):
    """A resumed run must produce the same trajectory as an unbroken one."""
    cfg, wp, lm, st = mid_run_state
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, st)
    st_resumed = load_checkpoint(path, st)
    st_resumed = jax.tree.map(jnp.asarray, st_resumed)

    key = jax.random.key(7)
    a, _ = run_epochs_rng(cfg, wp, lm, st, 10, key)
    b, _ = run_epochs_rng(cfg, wp, lm, st_resumed, 10, key)
    assert_tree_equal(a, b)


def test_npz_roundtrip_pf_state(tmp_path):
    pf = make_pf_state([1.0, 2.0, 0.3], 16, 8)
    path = str(tmp_path / "pf.npz")
    save_checkpoint(path, pf)
    assert_tree_equal(pf, load_checkpoint(path, pf))


def test_orbax_roundtrip(tmp_path, mid_run_state):
    pytest.importorskip("orbax.checkpoint")
    cfg, wp, lm, st = mid_run_state
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path, st)
    st2 = load_checkpoint(path, st)
    assert_tree_equal(st, st2)


def test_multihost_mesh_single_host():
    mesh = make_multihost_mesh(map_per_host=4)
    assert mesh.shape["map"] == 4
    assert mesh.shape["particle"] == len(jax.devices()) // 4
