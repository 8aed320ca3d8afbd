"""Linear-blend skinning (model.vert:34-48: 4-bone LBS).

``skinned = Σᵢ wᵢ · JT[jᵢ] · v`` for position, rotation part only for
normals. TPU formulation: blend the four gathered joint matrices into
one per-vertex matrix first (the matrices are 12 useful floats — packed
flat so each vertex costs 4 single-row gathers of 12 contiguous floats),
then apply once. Batched over instances by vmap; a Pallas fusion of
gather+blend+apply is a drop-in upgrade behind the same signature.
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_joint_mats(jt: jnp.ndarray) -> jnp.ndarray:
    """(J, 4, 4) → (J, 12): rows of the top 3×4 block."""
    return jt[:, :3, :].reshape(jt.shape[0], 12)


def skin_verts(jt: jnp.ndarray, verts, normals, weights, jidx):
    """Apply LBS.

    jt: (J, 4, 4) skinning matrices; verts/normals: (V, 3);
    weights: (V, 4); jidx: (V, 4) int32.
    Returns (skinned_verts (V,3), skinned_normals (V,3)).
    """
    packed = pack_joint_mats(jt)            # (J, 12)
    g = packed[jidx]                        # (V, 4, 12)
    blended = jnp.einsum("vk,vkm->vm", weights, g)   # (V, 12)
    m = blended.reshape(-1, 3, 4)
    sv = jnp.einsum("vij,vj->vi", m[:, :, :3], verts) + m[:, :, 3]
    sn = jnp.einsum("vij,vj->vi", m[:, :, :3], normals)
    return sv, sn
