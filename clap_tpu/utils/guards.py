"""Numeric guards + error containment (the sanitizer/cerr analogue,
SURVEY §5.2/§5.3).

The reference leans on ASan/UBSan builds (CMakeLists.txt:17-18) and
cerr-style degrade-and-continue (pipeline failure masks, clap.c:627-648).
The JAX analogue is FINITENESS: a NaN/Inf that enters the state pytree
silently poisons every later frame, and in a 4096-env batch one bad env
must not take down the other 4095. This module provides:

- ``finite_mask(tree)``: per-env validity over a batched state pytree.
- ``quarantine(tree, reset_tree)``: per-env degrade-and-continue — bad
  envs reset to a known-good state, healthy envs untouched (pure; safe
  to call inside the jitted step every frame).
- ``assert_finite(tree)``: host-side watchdog for the Engine loop's
  1 Hz status tick; names the first offending leaf (the abort-on-error
  `-E` CLI path, clap.c:909-915).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _leaf_bad(x, env_axis):
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return None
    axes = tuple(a for a in range(x.ndim) if a != env_axis)
    return ~jnp.all(jnp.isfinite(x), axis=axes) if axes else ~jnp.isfinite(x)


def finite_mask(tree, env_axis: int = 0):
    """(N,) bool: True where the env's state is entirely finite."""
    bads = [b for b in (_leaf_bad(x, env_axis)
                        for x in jax.tree.leaves(tree)) if b is not None]
    bad = bads[0]
    for b in bads[1:]:
        bad = bad | b
    return ~bad


def quarantine(tree, reset_tree, env_axis: int = 0):
    """Reset non-finite envs to ``reset_tree`` (broadcast or batched).

    Returns (tree', ok_mask). The healthy envs pass through bit-exactly;
    this is the per-env pipeline-failure mask of clap.c:627-648 applied
    to simulation state."""
    ok = finite_mask(tree, env_axis)

    def fix(x, r):
        if not jnp.issubdtype(x.dtype, jnp.floating) and \
                not jnp.issubdtype(x.dtype, jnp.integer) and \
                x.dtype != jnp.bool_:
            return x
        r = jnp.broadcast_to(r, x.shape) if r.ndim < x.ndim else r
        shape = [1] * x.ndim
        shape[env_axis] = ok.shape[0]
        return jnp.where(ok.reshape(shape), x, r)

    return jax.tree.map(fix, tree, reset_tree), ok


def assert_finite(tree, name: str = "state"):
    """Host-side check; raises FloatingPointError naming the first bad
    leaf. Call OUTSIDE jit (Engine watchdog tick)."""
    leaves, treedef = jax.tree.flatten(tree)
    import numpy as np

    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name} leaf #{i} "
                f"(shape {arr.shape})")
