#!/usr/bin/env python
"""Real-chip miscompilation canary (run on the TPU backend).

Guards the numeric patterns this package depends on against backend
miscompiles that CPU-side tests can never catch.  Found in r5: the axon
TPU backend compiled `x * sqrt(stack([Q[0,0], Q[1,1]]))` (diag-gather ->
stack -> broadcast-multiply) into a program whose second column is ZERO
— which silently removed all steering noise from the FastSLAM proposal
on the chip and was the entire r4 "chip-vs-CPU PF bias" open finding.
`jnp.broadcast_to` sidesteps the bad fusion; this canary fails loudly if
the workaround ever stops sufficing or the pattern regresses.

Exit 0 = all patterns compile correctly on this device.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")
    failures = []

    x = np.arange(200, dtype=np.float32).reshape(100, 2) + 1.0

    # 1. The r5 miscompile: diag-gather -> stack -> broadcast-multiply.
    def bad_pattern(x):
        Q = jnp.diag(jnp.asarray([0.25, 0.00274156], jnp.float32))
        sig = jnp.sqrt(jnp.stack([Q[0, 0], Q[1, 1]]))
        return x * sig

    t = np.asarray(jax.jit(bad_pattern)(x))
    ref = x * np.sqrt(np.array([0.25, 0.00274156], np.float32))
    if not np.allclose(t, ref, rtol=1e-5):
        failures.append(
            f"diag-stack-broadcast MISCOMPILES (col1[:3]={t[:3, 1]}) — "
            "known axon bug; code must keep using broadcast_to")
        print("  [known-bad] diag-stack-broadcast miscompiles on this "
              "backend (expected; workaround in predict_particles)")
    else:
        print("  [ok] diag-stack-broadcast compiles correctly here")

    # 2. The workaround MUST be correct.
    def fixed_pattern(x):
        Q = jnp.diag(jnp.asarray([0.25, 0.00274156], jnp.float32))
        sig = jnp.sqrt(jnp.stack([Q[0, 0], Q[1, 1]]))
        return x * jnp.broadcast_to(sig, x.shape)

    t = np.asarray(jax.jit(fixed_pattern)(x))
    if not np.allclose(t, ref, rtol=1e-5):
        print(f"FATAL: broadcast_to workaround wrong: {t[:3]}")
        return 1
    print("  [ok] broadcast_to workaround exact")

    # 3. The actual proposal: per-particle noise must have variance in
    # BOTH columns (the production predict_particles path).
    from tpuslam.filters.fastslam import make_pf_state, predict_particles

    pf = make_pf_state(jnp.zeros(3), 256, 8)
    Q = jnp.diag(jnp.asarray([0.25, 0.00274156], jnp.float32))

    @jax.jit
    def step(pf):
        return predict_particles(pf, jnp.float32(8.0), jnp.float32(0.1),
                                 Q, 4.0, 0.025, jax.random.key(7))

    poses = np.asarray(jax.block_until_ready(step(pf)).poses)
    sx, sphi = poses[:, 0].std(), poses[:, 2].std()
    print(f"  proposal spread: x std {sx:.4f}, heading std {sphi:.5f}")
    if sphi < 1e-5:
        print("FATAL: proposal heading noise is DEGENERATE on this "
              "device (the r4 chip-bias bug) — fix predict_particles")
        return 1
    print("  [ok] proposal noise live in both control channels")

    # 4. One-hot mask-reduce stays exact (the PF gather/scatter idiom).
    m = (np.arange(48)[:, None] == np.arange(64)[None, :]).astype(
        np.float32)
    v = (np.random.default_rng(0).uniform(50, 150, 64)
         .astype(np.float32))

    @jax.jit
    def onehot(m, v):
        import jax.numpy as jnp
        return jnp.einsum("oc,c->o", m, v,
                          precision=jax.lax.Precision.HIGHEST)

    g = np.asarray(onehot(m, v))
    if not np.array_equal(g, (m @ v).astype(np.float32)):
        print("FATAL: one-hot einsum gather not exact")
        return 1
    print("  [ok] one-hot einsum gather exact")
    print("CANARY PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
