"""Linear-blend skinning (model.vert:34-48: 4-bone LBS).

``skinned = Σᵢ wᵢ · JT[jᵢ] · v`` for position, rotation part only for
normals. TPU formulation: the 4 bone weights scatter into a dense
(V, J) blend matrix once (it depends only on the static rig, so XLA
hoists it out of any instance batch), and the per-vertex matrices come
from ONE MXU matmul ``W @ packed``. The obvious alternative —
``packed[jidx]`` row gathers — becomes a batched-OPERAND gather under
an instance vmap (per-instance joint tables, shared indices), which
runs at ~10 ns/row on TPU and was the entire r2 skinning budget
(13.7 ms / 1024 instances).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_joint_mats(jt: jnp.ndarray) -> jnp.ndarray:
    """(J, 4, 4) → (J, 12): rows of the top 3×4 block."""
    return jt[:, :3, :].reshape(jt.shape[0], 12)


def blend_matrix(weights, jidx, n_joints: int, dtype=jnp.float32):
    """(V, 4) weights + (V, 4) joint ids → dense (V, J) LBS blend
    matrix (shared across all instances of a rig)."""
    oh = (jidx[..., None] == jnp.arange(n_joints)[None, None, :])
    return jnp.einsum("vk,vkj->vj", weights.astype(dtype),
                      oh.astype(dtype))


def skin_verts(jt: jnp.ndarray, verts, normals, weights, jidx):
    """Apply LBS.

    jt: (J, 4, 4) skinning matrices; verts/normals: (V, 3);
    weights: (V, 4); jidx: (V, 4) int32.
    Returns (skinned_verts (V,3), skinned_normals (V,3)).
    """
    packed = pack_joint_mats(jt)            # (J, 12)
    W = blend_matrix(weights, jidx, packed.shape[0], verts.dtype)
    blended = jnp.einsum("vj,jm->vm", W, packed,
                         precision=jax.lax.Precision.HIGHEST)  # (V, 12)
    m = blended.reshape(-1, 3, 4)
    sv = jnp.einsum("vij,vj->vi", m[:, :, :3], verts) + m[:, :, 3]
    sn = jnp.einsum("vij,vj->vi", m[:, :, :3], normals)
    return sv, sn
