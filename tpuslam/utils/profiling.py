"""Profiling / tracing utilities.

The reference's only timing code is its real-time throttle
(sim/ekfslam-sim.jl:78,133-137), which *limits* rather than measures.
Here:

  * `trace(...)`: context manager around jax.profiler for device traces
    (view with TensorBoard / xprof);
  * `Stopwatch`: per-phase walltime accumulation for host-side loops;
  * `marginal_ms(...)`: the dispatch-cache/overhead-robust measurement
    primitive used by the bench harness — on this TPU stack, identical
    (executable, input) dispatches can be served from a cache and each
    dispatch carries tens of ms fixed overhead, so naive timing lies
    (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpuslam-trace"):
    """Device trace via jax.profiler (no-op fallback if unsupported)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class Stopwatch:
    """Accumulate walltime per named phase.

    with sw.phase("update"): ...
    print(sw.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(
                f"{name:24s} {t * 1e3:10.2f} ms total  "
                f"{t / max(c, 1) * 1e3:8.3f} ms/call  x{c}"
            )
        return "\n".join(lines)


def marginal_ms(run, n1: int, n2: int, *, repeats: int = 2,
                warm_seeds=(1000, 1001)) -> float:
    """Marginal ms-per-unit between run(n1, seed) and run(n2, seed) calls.

    `run` must consume (n_units, seed) and BLOCK until the result is real
    (block_until_ready + a host transfer).  Fresh seeds defeat result
    caching; differencing cancels fixed dispatch overhead and compile.
    """
    run(n1, warm_seeds[0])
    run(n2, warm_seeds[1])

    def best(n, s0):
        ts = []
        for i in range(repeats):
            t0 = time.perf_counter()
            run(n, s0 + i)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = best(n1, 1)
    t2 = best(n2, 100)
    return (t2 - t1) / (n2 - n1) * 1e3
