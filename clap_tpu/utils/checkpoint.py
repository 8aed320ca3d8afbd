"""Simulation checkpoint/resume (SURVEY §5.4: the reference has none —
"SoA pytree → orbax is trivial by construction there, absent here").

EngineState is one pytree, so full-state snapshots are a single save.
Uses orbax when available, with a numpy .npz fallback so checkpointing
works in minimal environments.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, state) -> str:
    """Save a pytree (EngineState or anything) to ``path``."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        flat, treedef = jax.tree.flatten(state)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 *[np.asarray(x) for x in flat])
        return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, template):
    """Restore into the structure of ``template``."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), template)
    except Exception:
        p = path if path.endswith(".npz") else path + ".npz"
        data = np.load(p)
        flat, treedef = jax.tree.flatten(template)
        arrays = [data[f"arr_{i}"] for i in range(len(flat))]
        import jax.numpy as jnp

        return jax.tree.unflatten(
            treedef, [jnp.asarray(a, dtype=t.dtype) for a, t in zip(arrays, flat)]
        )
