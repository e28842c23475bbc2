"""Failure detection + elastic recovery (SURVEY section 5).

The reference has neither (its closest analog is the browser 'reset'
command, wsserver.jl:161-174); a production engine running unattended at
config-4/5 scale needs both.  Design points, TPU-first:

  * Detection is DEVICE-side: `ekf_health` folds the filter state to ONE
    scalar inside the jitted chunk (finite pose/covariance, non-negative
    marginals, bounded trace), so the host pays a single-element transfer
    per chunk — not a full-state readback.  Reduced-precision map storage
    already self-heals transient non-finite Pmm entries in-loop
    (parallel/ekf_fused_sharded.psd_repair_local); this layer catches what
    in-loop guards cannot: persistent divergence, device faults, and
    host-visible exceptions.
  * Recovery is CHECKPOINT-restart (utils/checkpoint) at chunk
    granularity: the runner keeps a ring of the last-k healthy states on
    host, restores the newest on failure, and REPLAYS the chunk under a
    perturbed PRNG key (fold_in of the retry counter) — a deterministic
    retry would fail identically on an algorithmic divergence, while a
    re-seeded one escapes noise-realization-specific failures (the same
    logic as FastSLAM resampling escaping particle collapse).
  * Elasticity: the step function is arbitrary (dense, sharded, PF); on a
    multi-host deployment each host wraps its own runner and
    jax.distributed re-initialization is the caller's restart path — this
    module is the per-process piece.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


def ekf_health(x, P_diag, n, *, trace_bound: float = 1e6):
    """Device-side health scalar for an EKF-ish state: True iff the state
    is finite, marginal variances are non-negative (PSD necessary
    condition), and the total variance hasn't exploded.

    Call INSIDE the jitted chunk and return it with the chunk outputs —
    one bool crosses the wire.  Works under shard_map (all inputs are
    replicated or locally reducible; pass locally-summed diag for sharded
    Pmm and psum outside if exactness across shards matters — any shard
    flagging unhealthy flags the run)."""
    ok_x = jnp.isfinite(x).all()
    ok_d = jnp.isfinite(P_diag).all() & (P_diag >= -1e-6).all()
    ok_t = jnp.sum(P_diag) < trace_bound
    return ok_x & ok_d & ok_t & (n >= 0)


def ekf_state_health(st, **kw):
    """ekf_health over a dense filters.state.EKFState."""
    return ekf_health(st.x, jnp.diagonal(st.P), st.n, **kw)


class RecoveryEvent(NamedTuple):
    chunk: int        # chunk index that failed
    retry: int        # which retry fixed (or gave up on) it
    reason: str       # "unhealthy" | exception repr
    restored_to: int  # chunk index of the checkpoint restored


class ResilientRunner:
    """Chunked execution with failure detection and checkpoint-restart.

    step_fn(state, key) -> (state, aux): one chunk of work (typically a
    jitted multi-epoch scan).  health_fn(state, aux) -> bool-like: cheap
    host-side verdict (e.g. reading the device-side ekf_health scalar out
    of aux).  On an unhealthy verdict or a raised exception the runner
    restores the most recent healthy state and replays the chunk with
    key = fold_in(key, 1 + retry).  Gives up after `max_retries`
    consecutive failures of the same chunk (raising RuntimeError) — an
    algorithmic divergence that survives re-seeding needs a human.
    """

    def __init__(self, step_fn: Callable, health_fn: Callable, *,
                 max_retries: int = 3, keep: int = 2,
                 on_event: Callable[[RecoveryEvent], None] | None = None):
        self.step_fn = step_fn
        self.health_fn = health_fn
        self.max_retries = max_retries
        self.keep = max(keep, 1)
        self.on_event = on_event

    def run(self, state: Any, keys) -> tuple[Any, list, list]:
        """Run one chunk per key.  Returns (final_state, auxes, events)."""
        ring: list[tuple[int, Any]] = [(-1, jax.tree.map(np.asarray, state))]
        events: list[RecoveryEvent] = []
        auxes = []
        i = 0
        keys = list(keys)
        while i < len(keys):
            last_err = None
            for retry in range(self.max_retries + 1):
                k = keys[i] if retry == 0 else jax.random.fold_in(
                    keys[i], retry
                )
                try:
                    cand, aux = self.step_fn(state, k)
                    if bool(self.health_fn(cand, aux)):
                        break
                    last_err = "unhealthy"
                except Exception as e:  # device faults surface here
                    last_err = f"{type(e).__name__}: {e}"
                # Restore newest healthy checkpoint (host copy -> device).
                restored_to, snap = ring[-1]
                state = jax.tree.map(jnp.asarray, snap)
                ev = RecoveryEvent(chunk=i, retry=retry, reason=last_err,
                                   restored_to=restored_to)
                events.append(ev)
                if self.on_event:
                    self.on_event(ev)
            else:
                raise RuntimeError(
                    f"chunk {i} failed {self.max_retries + 1} times "
                    f"(last: {last_err}); state preserved at chunk "
                    f"{ring[-1][0]}"
                )
            state = cand
            auxes.append(aux)
            ring.append((i, jax.tree.map(np.asarray, state)))
            del ring[:-self.keep]
            i += 1
        return state, auxes, events


def resilient_ekf_run(cfg, waypoints, landmarks, st0, n_epochs: int, key,
                      *, chunk_epochs: int = 16, max_retries: int = 3,
                      trace_bound: float = 1e6, on_event=None):
    """Closed-loop EKF-SLAM with failure detection + checkpoint-restart.

    Same contract as sim.run_epochs_rng (minus per-tick records of failed
    chunks — replayed chunks contribute their healthy replay's records),
    plus the recovery-event log."""
    from tpuslam.sim.simulator import run_epochs_rng

    def step(st, k):
        st2, recs = run_epochs_rng(cfg, waypoints, landmarks, st,
                                   chunk_epochs, k)
        return st2, recs

    def healthy(st, _recs):
        return np.asarray(ekf_state_health(st.ekf,
                                           trace_bound=trace_bound))

    n_chunks = -(-n_epochs // chunk_epochs)
    keys = jax.random.split(key, n_chunks)
    runner = ResilientRunner(step, healthy, max_retries=max_retries,
                             on_event=on_event)
    st, recs_list, events = runner.run(st0, keys)
    recs = jax.tree.map(lambda *xs: np.concatenate(xs), *recs_list)
    return st, recs, events
