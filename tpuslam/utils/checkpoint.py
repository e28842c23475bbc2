"""Checkpoint / resume.

The reference has none (closest analog: the browser 'reset' command,
wsserver.jl:161-174 — SURVEY.md section 5).  Here the whole engine state is
a small pytree, so checkpointing is orbax when available with a plain
.npz fallback — both cover every state type in the framework (EKFState,
BlockEKFState, PFState, Sim/PFSimState, BAProblem).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax


def save_checkpoint(path: str, state: Any) -> None:
    """Save any engine pytree.  `path` is a directory (orbax) or .npz file."""
    if path.endswith(".npz"):
        leaves, treedef = jax.tree.flatten(state)
        np.savez(
            path,
            __treedef__=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8
            ),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_checkpoint.  `like` provides the
    structure (and, for orbax, shapes/dtypes)."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            leaves_like, treedef = jax.tree.flatten(like)
            leaves = [
                np.asarray(data[f"leaf_{i}"]) for i in range(len(leaves_like))
            ]
            leaves = [
                np.asarray(l, np.asarray(ref).dtype)
                for l, ref in zip(leaves, leaves_like)
            ]
            return jax.tree.unflatten(treedef, leaves)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), like
    )
    return ckptr.restore(os.path.abspath(path), target)
