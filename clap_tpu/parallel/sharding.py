"""Env-axis sharding over a device mesh.

The reference's "distributed" layer is a TCP log forwarder
(networking.c, SURVEY §2.12) — nothing touches the simulation path. The
TPU engine scales by sharding the env axis across chips: envs are
independent, so the only collectives are metric reductions; XLA inserts
nothing else. DCN-level scale-out shards the same axis across hosts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def env_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_envs(tree, mesh: Mesh, axis: str = "env"):
    """Place a batched pytree with the leading env axis sharded over the
    mesh; scalars/config stay replicated."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
