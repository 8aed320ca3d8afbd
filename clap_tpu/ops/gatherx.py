"""Batch-aware row gather.

``jax.vmap`` turns ``table[idx]`` with a per-env table into a
batched-OPERAND gather, which XLA:TPU executes ~5x slower than a plain
gather over a shared table with batched indices (measured r2/r3; see
ROUND_NOTES.md cost model). ``gather_rows`` is the same operation with
a custom vmap rule that flattens the batch axis into the row axis —
one shared (B*T, ...) table, indices offset by env*T — so the lowered
HLO is always the fast shared-table form.

The composed 16-env trace put 22 ms/frame (26%) in the two per-tile
record pre-gathers alone before this change.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.custom_batching import custom_vmap


@custom_vmap
def gather_rows(table, idx):
    """``table[idx]``: rows of ``table`` (T, ...) at ``idx`` (any shape,
    int32, values in [0, T)). Under vmap, per-env tables flatten into
    the row axis instead of becoming batched-operand gathers."""
    return table[idx]


@gather_rows.def_vmap
def _gather_rows_vmap(axis_size, in_batched, table, idx):
    table_b, idx_b = in_batched
    if table_b and idx_b:
        B, T = table.shape[0], table.shape[1]
        flat = table.reshape((B * T,) + table.shape[2:])
        off = jnp.arange(B, dtype=idx.dtype).reshape(
            (B,) + (1,) * (idx.ndim - 1))
        return gather_rows(flat, idx + off * T), True
    if idx_b:
        # shared table, per-env indices: already the fast path
        return gather_rows(table, idx), True
    if table_b:
        # per-env tables, shared indices: index the row axis directly
        out = gather_rows(jnp.moveaxis(table, 0, 1), idx)
        return jnp.moveaxis(out, idx.ndim, 0), True
    return gather_rows(table, idx), False
