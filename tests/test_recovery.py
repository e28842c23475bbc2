"""Failure detection + elastic recovery (utils/recovery.py).

The reference has no failure handling (closest: browser 'reset',
wsserver.jl:161-174); this subsystem is SURVEY section 5's
failure-detection/recovery row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import course1_config
from tpuslam.sim.scene import load_course, make_landmarks
from tpuslam.sim.simulator import init_sim_state
from tpuslam.utils.recovery import (
    ResilientRunner,
    ekf_state_health,
    resilient_ekf_run,
)


def test_health_scalar():
    cfg = course1_config(n_landmarks=8, capacity=8, max_obs=8)
    wp = jnp.asarray(load_course(), jnp.float32)
    st = init_sim_state(cfg, wp, dtype=jnp.float32)
    assert bool(ekf_state_health(st.ekf))

    bad = st.ekf._replace(x=st.ekf.x.at[0].set(jnp.nan))
    assert not bool(ekf_state_health(bad))
    neg = st.ekf._replace(P=st.ekf.P.at[0, 0].set(-1.0))
    assert not bool(ekf_state_health(neg))
    big = st.ekf._replace(P=st.ekf.P.at[0, 0].set(1e9))
    assert not bool(ekf_state_health(big))


def test_runner_recovers_from_poisoned_chunk():
    """A step that diverges on one specific key must be detected, rolled
    back, and replayed under a folded key; the run completes with the
    correct number of healthy chunks."""
    poison_chunk = 2
    keys = list(jax.random.split(jax.random.key(0), 5))
    poison_key = jax.random.key_data(keys[poison_chunk])

    def step(state, key):
        x, i = state
        # Deterministic "divergence" on the ORIGINAL key of chunk 2 only
        # (the replay's folded key escapes it — the noise-realization
        # failure model).
        poisoned = jnp.all(jax.random.key_data(key) == poison_key)
        x2 = jnp.where(poisoned, jnp.nan, x + 1.0)
        return (x2, i + 1), float(x2)

    def healthy(state, _aux):
        return bool(jnp.isfinite(state[0]))

    events = []
    runner = ResilientRunner(
        lambda s, k: step(s, k), healthy, max_retries=3,
        on_event=events.append,
    )
    # i enters the step as part of the state so the poison is positional;
    # after a rollback the replay re-runs the SAME i.
    (x, i), auxes, evs = runner.run(
        (jnp.zeros(()), jnp.zeros((), jnp.int32)), keys
    )
    assert float(x) == 5.0 and int(i) == 5       # all chunks completed
    assert len(auxes) == 5
    assert len(evs) >= 1
    assert evs[0].chunk == poison_chunk and evs[0].reason == "unhealthy"
    assert evs[0].restored_to == poison_chunk - 1
    assert events == evs                          # callback fired


def test_runner_gives_up_after_max_retries():
    def step(state, key):
        return state + jnp.nan, None

    runner = ResilientRunner(step, lambda s, a: bool(jnp.isfinite(s)),
                             max_retries=2)
    with pytest.raises(RuntimeError, match="failed 3 times"):
        runner.run(jnp.zeros(()), jax.random.split(jax.random.key(0), 1))


def test_resilient_ekf_run_clean_path():
    """On a healthy run the wrapper is record-equivalent to chunked
    run_epochs_rng and reports zero events."""
    from tpuslam.sim.simulator import run_epochs_rng

    cfg = course1_config(n_landmarks=16, capacity=24, max_obs=16)
    wp = jnp.asarray(load_course(), jnp.float32)
    lm = jnp.asarray(make_landmarks(cfg.scene, seed=3), jnp.float32)
    st0 = init_sim_state(cfg, wp, dtype=jnp.float32)

    key = jax.random.key(5)
    st, recs, events = resilient_ekf_run(
        cfg, wp, lm, st0, 32, key, chunk_epochs=8
    )
    assert events == []
    # Reproduce manually with the same chunk keys.
    ks = jax.random.split(key, 4)
    stm = st0
    parts = []
    for k in ks:
        stm, r = run_epochs_rng(cfg, wp, lm, stm, 8, k)
        parts.append(r)
    want = jax.tree.map(lambda *xs: np.concatenate(xs), *parts)
    np.testing.assert_array_equal(recs.slam_pose, want.slam_pose)
    np.testing.assert_array_equal(np.asarray(st.ekf.x),
                                  np.asarray(stm.ekf.x))
