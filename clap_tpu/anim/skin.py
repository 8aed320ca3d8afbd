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


def skin_verts_batch(jts: jnp.ndarray, verts, normals, weights, jidx,
                     blend=None):
    """LBS for B instances of ONE rig/mesh in a single MXU contraction.

    ``jax.vmap(skin_verts)`` lowers the blend to B tiny (V,J)@(J,12)
    dots whose 12-wide outputs lane-pad to 128 on TPU — ~10× padded
    HBM traffic on the (B,V,12) intermediate (the r3 skinning bench
    spent most of its 5.4 ms there). Here the instance axis joins the
    LANE axis instead: one (V,J) @ (J, 12·B) matmul with COMPONENT-MAJOR
    columns (component c of every instance contiguous), so each of the
    12 per-component slices is a full (V, B) lane block — no padding,
    no strided lane reads.

    jts: (B, J, 4, 4); verts/normals: (V, 3); weights/jidx: (V, 4)
    (or pass a precomputed dense ``blend`` (V, J) matrix instead).
    Returns (sv (B, V, 3), sn (B, V, 3)).
    """
    B, J = jts.shape[0], jts.shape[1]
    W = blend_matrix(weights, jidx, J, verts.dtype) \
        if blend is None else blend                        # (V, J) shared
    # (B, J, 12) → (J, 12, B) → (J, 12·B), component-major lanes
    pT = jnp.transpose(jts[:, :, :3, :].reshape(B, J, 12), (1, 2, 0))
    bl = jnp.einsum("vj,jm->vm", W, pT.reshape(J, 12 * B),
                    precision=jax.lax.Precision.HIGHEST)   # (V, 12B)

    def comp(c):
        return bl[:, c * B:(c + 1) * B]                     # (V, B) slice

    vx, vy, vz = verts[:, 0:1], verts[:, 1:2], verts[:, 2:3]
    nx, ny, nz = normals[:, 0:1], normals[:, 1:2], normals[:, 2:3]
    sv = jnp.stack(
        [comp(4 * i) * vx + comp(4 * i + 1) * vy + comp(4 * i + 2) * vz
         + comp(4 * i + 3) for i in range(3)], axis=-1)     # (V, B, 3)
    sn = jnp.stack(
        [comp(4 * i) * nx + comp(4 * i + 1) * ny + comp(4 * i + 2) * nz
         for i in range(3)], axis=-1)
    return jnp.transpose(sv, (1, 0, 2)), jnp.transpose(sn, (1, 0, 2))
