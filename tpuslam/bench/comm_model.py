"""Analytic communication/compute model of the sharded EKF update —
the scaling-efficiency predictor for BASELINE configs 4-5 (multi-chip
hardware is not reachable from this environment; see PERF.md "Distributed
scaling" for the measured single-chip anchors this model extrapolates).

Per observation epoch the fused sharded engine (parallel/ekf_fused_sharded)
moves exactly TWO collectives across the 'map' axis:

  1. psum of the Schur system C (m2, m2), m2 = 2*max_nz
       ring all-reduce: ~2 * m2^2 * B bytes per link
  2. all_gather of the gain panel W1_m (2cap, m2)
       ring: (D-1)/D * 2cap * m2 * B bytes per link

while each shard's compute is dominated by streaming its Pmm row block
twice (read for PHt_m, read+write for the rank-k application — the kernels
run at the HBM roofline, PERF.md "kernel rooflines"):

       t_comp ~ 3 * (2cap)^2 * B / (D * HBM)

Per-shard compute falls ~1/D while the all_gather bytes stay ~constant, so
efficiency at D shards is t_comp / (t_comp + t_comm) with a cap^2 / cap
ratio — the landmark axis must be long enough for its square to dominate.

Bandwidth defaults are TPU v5e figures: 819 GB/s HBM; ICI ~45 GB/s per
direction per link; DCN ~12.5 GB/s per host (100 Gbps NICs).  All
overridable for other topologies.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CommModel:
    """One (cap, max_nz, D) point of the scaling model."""

    cap: int
    max_nz: int
    n_map: int
    bytes_psum: float       # per-link bytes of the Schur psum
    bytes_allgather: float  # per-link bytes of the gain-panel all_gather
    t_comp_s: float         # per-shard covariance streaming time
    t_comm_s: float         # collective time on the given fabric
    efficiency: float       # t_comp / (t_comp + t_comm)
    updates_per_s: float    # 1 / (t_comp + t_comm)


def ekf_update_model(cap: int, max_nz: int, n_map: int, *,
                     bytes_per: int = 4,
                     hbm_gbps: float = 819.0,
                     link_gbps: float = 45.0,
                     collective_latency_s: float = 0.0,
                     covariance_passes: float = 3.0) -> CommModel:
    """Predict per-update time/efficiency of the sharded Schur EKF update.

    `link_gbps` is the per-direction bandwidth of the fabric the 'map'
    axis rides: ICI (~45 GB/s on v5e) within a host, DCN (~12.5 GB/s)
    when the map axis must span hosts (1M-landmark configs).
    `collective_latency_s` is the fixed per-collective launch/sync cost
    (two collectives per update); calibrate both constants against a real
    mesh with `measure_collectives` when one is available.

    HONESTY CAVEAT: in this environment (one reachable chip) the defaults
    are datasheet values, NOT measured collective performance; the only
    runnable calibration target is the virtual CPU mesh, which validates
    the model's affine latency+bandwidth SHAPE but not the magnitudes.
    """
    m2 = 2 * max_nz
    D = n_map
    rows = 2 * cap

    by_psum = 2.0 * m2 * m2 * bytes_per
    by_ag = (D - 1) / D * rows * m2 * bytes_per if D > 1 else 0.0
    t_comm = ((by_psum + by_ag) / (link_gbps * 1e9)
              + 2.0 * collective_latency_s) if D > 1 else 0.0
    t_comp = covariance_passes * rows * rows * bytes_per / (
        D * hbm_gbps * 1e9
    )
    tot = t_comp + t_comm
    return CommModel(
        cap=cap, max_nz=max_nz, n_map=D,
        bytes_psum=by_psum, bytes_allgather=by_ag,
        t_comp_s=t_comp, t_comm_s=t_comm,
        efficiency=t_comp / tot if tot else 1.0,
        updates_per_s=1.0 / tot if tot else float("inf"),
    )


def scaling_table(cap: int, max_nz: int, shard_counts=(1, 2, 4, 8, 16),
                  **kw) -> list[CommModel]:
    """Efficiency vs shard count at fixed problem size (strong scaling)."""
    return [ekf_update_model(cap, max_nz, d, **kw) for d in shard_counts]


def measure_collectives(sizes=(2 ** 12, 2 ** 16, 2 ** 20, 2 ** 22),
                        n_rep: int = 5, axis: str = "map"):
    """Microbenchmark psum / all_gather on whatever mesh THIS process can
    build, and fit the affine collective model t = latency + bytes/bw.

    Returns {"psum": {"latency_s", "gbps"}, "all_gather": {...},
    "n_devices", "platform"} — feed the fitted constants into
    ekf_update_model(link_gbps=..., collective_latency_s=...).

    On real multi-chip hardware this calibrates the ICI constants the
    scaling table otherwise takes from datasheets.  On this environment's
    8-device virtual CPU mesh the numbers are host overhead (shared
    memory, one physical CPU) — useful only as a shape check of the
    model, never as TPU bandwidth; callers should report the platform
    alongside the fit.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    D = len(devs)
    if D < 2:
        return {"n_devices": D, "platform": devs[0].platform,
                "psum": None, "all_gather": None,
                "note": "needs >= 2 devices"}
    mesh = Mesh(np.asarray(devs), (axis,))

    def timed(fn, x):
        fn(x).block_until_ready()  # compile
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            fn(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    results = {"n_devices": D, "platform": devs[0].platform}
    ops = {
        "psum": lambda x: lax.psum(x, axis),
        "all_gather": lambda x: lax.all_gather(x, axis, tiled=True),
    }
    for name, op in ops.items():
        ts, bys = [], []
        for n in sizes:
            f = jax.jit(jax.shard_map(
                op, mesh=mesh, in_specs=P(axis), out_specs=P(None),
                check_vma=False,
            ))
            x = jnp.ones((D * n,), jnp.float32)
            ts.append(timed(f, x))
            # Ring cost per link: psum moves ~2*n floats, all_gather
            # (D-1)/D * D*n — use the same per-link convention as the
            # model above.
            bys.append((2.0 * n if name == "psum"
                        else (D - 1) * n) * 4.0)
        A = np.stack([np.ones(len(ts)), np.asarray(bys)], axis=1)
        coef, *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)
        lat, per_byte = float(coef[0]), float(max(coef[1], 1e-15))
        results[name] = {
            "latency_s": max(lat, 0.0),
            "gbps": 1.0 / per_byte / 1e9,
            "points": [(int(b), float(t)) for b, t in zip(bys, ts)],
        }
    return results


def min_cap_for_efficiency(target: float, max_nz: int, n_map: int,
                           **kw) -> int:
    """Smallest capacity (power of two) whose predicted strong-scaling
    efficiency at `n_map` shards reaches `target` — the 'how long must the
    landmark axis be before sharding pays' question of BASELINE config 4."""
    cap = 1024
    while cap <= 2 ** 24:
        if ekf_update_model(cap, max_nz, n_map, **kw).efficiency >= target:
            return cap
        cap *= 2
    raise ValueError(f"no capacity reaches {target} at D={n_map}")
