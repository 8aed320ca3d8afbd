"""Engine-state → renderer glue (reference: models_render model.c:742-1086
— THE draw loop: per-entity cull, LOD select, uniforms, draw).

At scene load, every active entity gets an instanced copy of its model's
topology in one concatenated vertex/face table (static shapes). Per
frame, one packed gather + einsum transforms all instance vertices by
their entity world matrices, frustum culling masks faces by entity, and
distance LOD masks faces by the entity's selected LOD — the whole draw
list becomes data for ONE rasterizer invocation instead of per-entity
draw calls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import mathx as mx
from ..scene.mesh import LOD_MAX, build_lods
from .pipeline import SceneGeometry
from .view import aabb_in_frustum

# distance LOD thresholds (model.c:975-998 picks LOD by camera distance)
LOD_DISTANCES = (30.0, 60.0, 120.0)


class ModelData(NamedTuple):
    """Host-side per-model render data fed to build_render_tables."""

    verts: np.ndarray        # (V, 3)
    normals: np.ndarray      # (V, 3)
    base_color: np.ndarray   # (V, 3)
    rough_metal: np.ndarray  # (V, 2)
    emission: np.ndarray     # (V, 3)
    lod_faces: list          # [ (T_l, 3) ] per LOD (from mesh.build_lods)
    uv: np.ndarray = None        # (V, 2)
    tangent: np.ndarray = None   # (V, 4) xyz + handedness
    tex_id: int = -1             # texture-set layer (model3dtx set)
    mat_fbm: tuple = None        # (amp, scale, r_floor, r_ceil,
                                 #  m_floor, m_ceil) — lighting.glsl:20-50


class RenderTables(NamedTuple):
    """Static instanced geometry (device constants)."""

    verts: jnp.ndarray        # (Vi, 3) model-local instance verts
    normals: jnp.ndarray      # (Vi, 3)
    base_color: jnp.ndarray   # (Vi, 3)
    rough_metal: jnp.ndarray  # (Vi, 2)
    emission: jnp.ndarray     # (Vi, 3)
    uv: jnp.ndarray           # (Vi, 2)
    tangent: jnp.ndarray      # (Vi, 4)
    tex_id: jnp.ndarray       # (Vi,) f32 layer, -1 untextured
    mat_fbm: jnp.ndarray      # (Vi, 6)
    any_material: bool        # static: any uv/texture/fbm data present
    vert_entity: jnp.ndarray  # (Vi,) int32 entity slot per vertex
    faces: jnp.ndarray        # (Ti, 3) into instance verts (all LODs)
    face_entity: jnp.ndarray  # (Ti,) int32
    face_lod: jnp.ndarray     # (Ti,) int32
    entity_aabb: jnp.ndarray  # (E, 2, 3) model-local AABB per entity


def model_from_mesh(verts, normals, faces, base_color=(0.7, 0.7, 0.7),
                    rough_metal=(0.7, 0.0), emission=(0, 0, 0),
                    with_lods: bool = True, uv=None, tex_id: int = -1,
                    mat_fbm=None) -> ModelData:
    verts = np.asarray(verts, np.float32)
    V = len(verts)
    lods = build_lods(verts, np.asarray(faces).reshape(-1)) if with_lods \
        else [np.asarray(faces, np.uint32).reshape(-1)]
    # Morton-order each LOD's faces so cluster binning gets compact
    # spatial patches (raster.cluster_faces; grid/strip emitters
    # otherwise produce long thin clusters that double tile overlap)
    from .raster import cluster_faces

    lods = [cluster_faces(verts, l.reshape(-1, 3))[0].reshape(-1)
            for l in lods]
    tangent = None
    if uv is not None:
        uv = np.asarray(uv, np.float32)
        tangent = compute_tangents(verts,
                                   np.asarray(normals, np.float32),
                                   uv, lods[0].reshape(-1, 3))
    return ModelData(
        verts=verts,
        normals=np.asarray(normals, np.float32),
        base_color=np.broadcast_to(np.asarray(base_color, np.float32),
                                   (V, 3)).copy(),
        rough_metal=np.broadcast_to(np.asarray(rough_metal, np.float32),
                                    (V, 2)).copy(),
        emission=np.broadcast_to(np.asarray(emission, np.float32),
                                 (V, 3)).copy(),
        lod_faces=[l.reshape(-1, 3) for l in lods],
        uv=uv, tangent=tangent, tex_id=tex_id, mat_fbm=mat_fbm,
    )


def compute_tangents(verts, normals, uvs, faces):
    """Per-vertex tangents from UV gradients (the standard Lengyel
    accumulation — the data model.vert:54-67 consumes as TANGENTS).
    Returns (V, 4): xyz tangent + bitangent handedness w."""
    V = len(verts)
    tan = np.zeros((V, 3), np.float32)
    bit = np.zeros((V, 3), np.float32)
    f = np.asarray(faces, np.int64)
    p0, p1, p2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    t0, t1, t2 = uvs[f[:, 0]], uvs[f[:, 1]], uvs[f[:, 2]]
    e1, e2 = p1 - p0, p2 - p0
    d1, d2 = t1 - t0, t2 - t0
    det = d1[:, 0] * d2[:, 1] - d2[:, 0] * d1[:, 1]
    r = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1, det))
    td = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) * r[:, None]
    bd = (e2 * d1[:, 0:1] - e1 * d2[:, 0:1]) * r[:, None]
    for k in range(3):
        np.add.at(tan, f[:, k], td)
        np.add.at(bit, f[:, k], bd)
    n = np.asarray(normals, np.float32)
    t = tan - n * np.sum(n * tan, -1, keepdims=True)
    ln = np.linalg.norm(t, axis=-1, keepdims=True)
    t = np.where(ln > 1e-8, t / np.maximum(ln, 1e-8),
                 np.array([1.0, 0.0, 0.0], np.float32))
    w = np.where(np.sum(np.cross(n, t) * bit, -1) < 0, -1.0, 1.0)
    return np.concatenate([t, w[:, None]], -1).astype(np.float32)


def build_render_tables(models: list[ModelData], entity_model: np.ndarray,
                        entity_active: np.ndarray) -> RenderTables:
    """Instance-expand models over active entity slots (host)."""
    vs, ns, bc, rm, em, ve = [], [], [], [], [], []
    uvs, tgs, tids, fbms = [], [], [], []
    fs, fe, fl = [], [], []
    aabbs = np.zeros((len(entity_model), 2, 3), np.float32)
    voff = 0
    any_material = any(
        m.uv is not None or m.tex_id >= 0 or m.mat_fbm is not None
        for m in models)
    for ei, (mi, act) in enumerate(zip(entity_model, entity_active)):
        if not act:
            continue
        m = models[int(mi)]
        V = len(m.verts)
        vs.append(m.verts)
        ns.append(m.normals)
        bc.append(m.base_color)
        rm.append(m.rough_metal)
        em.append(m.emission)
        uvs.append(m.uv if m.uv is not None else np.zeros((V, 2), np.float32))
        tgs.append(m.tangent if m.tangent is not None
                   else np.tile(np.array([1, 0, 0, 1], np.float32), (V, 1)))
        tids.append(np.full(V, float(m.tex_id), np.float32))
        fbms.append(np.tile(np.asarray(
            m.mat_fbm if m.mat_fbm is not None else (0.0,) * 6,
            np.float32), (V, 1)))
        ve.append(np.full(len(m.verts), ei, np.int32))
        for lod, faces in enumerate(m.lod_faces):
            fs.append(faces.astype(np.int64) + voff)
            fe.append(np.full(len(faces), ei, np.int32))
            fl.append(np.full(len(faces), lod, np.int32))
        aabbs[ei, 0] = m.verts.min(0)
        aabbs[ei, 1] = m.verts.max(0)
        voff += len(m.verts)
    cat = lambda xs, d=np.float32: jnp.asarray(  # noqa: E731
        np.concatenate(xs) if xs else np.zeros((0,), d))
    return RenderTables(
        verts=cat(vs), normals=cat(ns), base_color=cat(bc),
        rough_metal=cat(rm), emission=cat(em),
        uv=cat(uvs), tangent=cat(tgs), tex_id=cat(tids),
        mat_fbm=cat(fbms), any_material=any_material,
        vert_entity=cat(ve, np.int32).astype(jnp.int32),
        faces=jnp.asarray(np.concatenate(fs).astype(np.int32)
                          if fs else np.zeros((0, 3), np.int32)),
        face_entity=cat(fe, np.int32).astype(jnp.int32),
        face_lod=cat(fl, np.int32).astype(jnp.int32),
        entity_aabb=jnp.asarray(aabbs),
    )


def assemble_scene_geometry(rt: RenderTables, entity_mx, entity_visible,
                            cam_planes, cam_pos,
                            skip_culling=None) -> SceneGeometry:
    """Per-frame geometry assembly: transform instance verts by entity
    matrices, cull per entity, select LOD per entity by distance
    (models_render model.c:969-998)."""
    # pack world matrices (E, 12) → one gather per vertex
    packed = entity_mx[:, :3, :].reshape(entity_mx.shape[0], 12)
    g = packed[rt.vert_entity]                            # (Vi, 12)
    m = g.reshape(-1, 3, 4)
    wverts = jnp.einsum("vij,vj->vi", m[:, :, :3], rt.verts) + m[:, :, 3]
    wnorm = jnp.einsum("vij,vj->vi", m[:, :, :3], rt.normals)
    wnorm = wnorm / jnp.maximum(
        jnp.linalg.norm(wnorm, axis=-1, keepdims=True), 1e-6)
    wtan = None
    if rt.any_material:
        wt = jnp.einsum("vij,vj->vi", m[:, :, :3], rt.tangent[:, :3])
        wt = wt / jnp.maximum(
            jnp.linalg.norm(wt, axis=-1, keepdims=True), 1e-6)
        wtan = jnp.concatenate([wt, rt.tangent[:, 3:4]], axis=-1)

    # per-entity world AABB (center/extent transform) + frustum cull
    c = 0.5 * (rt.entity_aabb[:, 0] + rt.entity_aabb[:, 1])
    e = 0.5 * (rt.entity_aabb[:, 1] - rt.entity_aabb[:, 0])
    wc = jnp.einsum("nij,nj->ni", entity_mx[:, :3, :3], c) + entity_mx[:, :3, 3]
    we = jnp.einsum("nij,nj->ni", jnp.abs(entity_mx[:, :3, :3]), e)
    in_frustum = aabb_in_frustum(cam_planes, wc - we, wc + we)
    if skip_culling is not None:  # ENTITY3D_SKIP_CULLING (terrain etc.)
        in_frustum = in_frustum | skip_culling

    # distance LOD (model.c:975-998)
    dist = jnp.linalg.norm(wc - cam_pos[None], axis=-1)
    lod = jnp.searchsorted(jnp.asarray(LOD_DISTANCES), dist).astype(jnp.int32)
    lod = jnp.minimum(lod, LOD_MAX - 1)

    ent_ok = entity_visible & in_frustum
    fv = ent_ok[rt.face_entity] & (rt.face_lod == lod[rt.face_entity])

    if not rt.any_material:
        return SceneGeometry(
            verts=wverts, normals=wnorm, faces=rt.faces, face_valid=fv,
            base_color=rt.base_color, rough_metal=rt.rough_metal,
            emission=rt.emission,
        )
    return SceneGeometry(
        verts=wverts, normals=wnorm, faces=rt.faces, face_valid=fv,
        base_color=rt.base_color, rough_metal=rt.rough_metal,
        emission=rt.emission, uv=rt.uv, tangent=wtan, tex_id=rt.tex_id,
        local_pos=rt.verts, mat_fbm=rt.mat_fbm,
    )
