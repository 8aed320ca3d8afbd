"""Joint hierarchy propagation + skinning matrices (model.c:1352-1404).

The reference recursively walks the joint tree computing
``global = parent_global · T·R·S`` and ``joint_transform = global ·
inverse_bind`` (one_joint_transform). A recursive walk is serial; the
TPU version precomputes topological LEVELS on the host and processes
each level as one batched gather + matmul — depth-many sequential steps
of wide parallel work instead of J-many serial ones.

JOINTS_MAX mirrors shader_constants.h:6 (200).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import mathx as mx
from .clips import Pose

JOINTS_MAX = 200


class Skeleton(NamedTuple):
    parent: jnp.ndarray      # (J,) int32, -1 for roots
    invbind: jnp.ndarray     # (J, 4, 4) inverse bind matrices
    base: Pose               # rest pose (node TRS from glTF)
    levels: jnp.ndarray      # (D, W) int32 node ids per level, -1 padding


def build_skeleton(parent, invbind, base_trans, base_rot, base_scale) -> Skeleton:
    """Host-side: compute levels from the parent array."""
    parent = np.asarray(parent, np.int32)
    J = len(parent)
    depth = np.zeros(J, np.int32)
    for i in range(J):
        depth[i] = 0 if parent[i] < 0 else depth[parent[i]] + 1
    D = int(depth.max()) + 1 if J else 1
    W = max(int(np.max(np.bincount(depth))), 1) if J else 1
    levels = np.full((D, W), -1, np.int32)
    for d in range(D):
        nodes = np.nonzero(depth == d)[0]
        levels[d, : len(nodes)] = nodes
    return Skeleton(
        parent=jnp.asarray(parent),
        invbind=jnp.asarray(invbind, jnp.float32),
        base=Pose(trans=jnp.asarray(base_trans, jnp.float32),
                  rot=jnp.asarray(base_rot, jnp.float32),
                  scale=jnp.asarray(base_scale, jnp.float32)),
        levels=jnp.asarray(levels),
    )


def local_matrices(pose: Pose) -> jnp.ndarray:
    """(J, 4, 4) local T·R·S per joint (model.c:1369-1383)."""
    return mx.mat4_compose_trs(pose.trans, pose.rot, pose.scale)


def global_matrices(sk: Skeleton, local: jnp.ndarray) -> jnp.ndarray:
    """Propagate the hierarchy level by level.

    Per-level parent gather + node scatter run as one-hot matmuls
    (exact selection under HIGHEST): under an instance vmap the
    ``glob[p]`` row gather is a batched-operand gather and the
    ``.at[n].set`` a batched scatter — both ~10 ns/row on TPU, which
    dominated the r2 skinning bench; the selection matrices depend only
    on the static skeleton."""
    import jax

    J = local.shape[0]
    glob = local  # roots are already correct
    D, W = sk.levels.shape
    jj = jnp.arange(J)
    hi = jax.lax.Precision.HIGHEST
    lflat = local.reshape(J, 16)
    for d in range(1, D):  # trace-time loop over depth (static)
        nodes = sk.levels[d]                      # (W,)
        ok = nodes >= 0
        n = jnp.maximum(nodes, 0)
        p = jnp.maximum(sk.parent[n], 0)
        sel_n = ((n[:, None] == jj[None, :]) & ok[:, None]
                 ).astype(local.dtype)            # (W, J) static
        sel_p = ((p[:, None] == jj[None, :]) & ok[:, None]
                 ).astype(local.dtype)
        gp = jnp.einsum("wj,jm->wm", sel_p, glob.reshape(J, 16),
                        precision=hi).reshape(W, 4, 4)
        ln = jnp.einsum("wj,jm->wm", sel_n, lflat,
                        precision=hi).reshape(W, 4, 4)
        upd = jnp.einsum("wij,wjk->wik", gp, ln)
        cover = jnp.einsum("wj->j", sel_n)        # (J,) 0/1
        scat = jnp.einsum("wj,wm->jm", sel_n, upd.reshape(W, 16),
                          precision=hi).reshape(J, 4, 4)
        glob = glob * (1.0 - cover)[:, None, None] + scat
    return glob


def joint_matrices(sk: Skeleton, pose: Pose) -> jnp.ndarray:
    """(J, 4, 4) skinning matrices: global · inverse_bind
    (model.c:1397-1403)."""
    glob = global_matrices(sk, local_matrices(pose))
    return jnp.einsum("jik,jkl->jil", glob, sk.invbind)
