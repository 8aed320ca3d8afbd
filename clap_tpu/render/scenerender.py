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


class RenderTables(NamedTuple):
    """Static instanced geometry (device constants)."""

    verts: jnp.ndarray        # (Vi, 3) model-local instance verts
    normals: jnp.ndarray      # (Vi, 3)
    base_color: jnp.ndarray   # (Vi, 3)
    rough_metal: jnp.ndarray  # (Vi, 2)
    emission: jnp.ndarray     # (Vi, 3)
    vert_entity: jnp.ndarray  # (Vi,) int32 entity slot per vertex
    faces: jnp.ndarray        # (Ti, 3) into instance verts (all LODs)
    face_entity: jnp.ndarray  # (Ti,) int32
    face_lod: jnp.ndarray     # (Ti,) int32
    entity_aabb: jnp.ndarray  # (E, 2, 3) model-local AABB per entity


def model_from_mesh(verts, normals, faces, base_color=(0.7, 0.7, 0.7),
                    rough_metal=(0.7, 0.0), emission=(0, 0, 0),
                    with_lods: bool = True) -> ModelData:
    verts = np.asarray(verts, np.float32)
    V = len(verts)
    lods = build_lods(verts, np.asarray(faces).reshape(-1)) if with_lods \
        else [np.asarray(faces, np.uint32).reshape(-1)]
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
    )


def build_render_tables(models: list[ModelData], entity_model: np.ndarray,
                        entity_active: np.ndarray) -> RenderTables:
    """Instance-expand models over active entity slots (host)."""
    vs, ns, bc, rm, em, ve = [], [], [], [], [], []
    fs, fe, fl = [], [], []
    aabbs = np.zeros((len(entity_model), 2, 3), np.float32)
    voff = 0
    for ei, (mi, act) in enumerate(zip(entity_model, entity_active)):
        if not act:
            continue
        m = models[int(mi)]
        vs.append(m.verts)
        ns.append(m.normals)
        bc.append(m.base_color)
        rm.append(m.rough_metal)
        em.append(m.emission)
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

    return SceneGeometry(
        verts=wverts, normals=wnorm, faces=rt.faces, face_valid=fv,
        base_color=rt.base_color, rough_metal=rt.rough_metal,
        emission=rt.emission,
    )
