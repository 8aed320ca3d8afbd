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
    ent_max_lod: jnp.ndarray = None  # (E,) int32 coarsest AVAILABLE LOD
                                     # per entity — distance LOD clamps
                                     # here, or single-LOD models
                                     # (with_lods=False) would render
                                     # NOTHING beyond LOD_DISTANCES[0]
                                     # (the face mask matches lod ==
                                     # face_lod exactly; model.c clamps
                                     # to the model's own LOD count)
    edge_id: jnp.ndarray = None  # (Vi,) f32 solid id 0-15 + 128·exclude
                                 # (RT2 alpha packing, model.frag:109-125)
    # STATIC shadow-caster subset: the coarsest LOD of every entity.
    # Shadow passes raster this stream instead of the full all-LOD face
    # table — the testbed's 4-cascade atlas stream shrinks 62k → 4.1k
    # records per env (shadow maps never need finer LODs, and the
    # per-env LOD mask can't shrink the STATIC stream the record
    # pipeline walks).
    shadow_faces: jnp.ndarray = None        # (Ts, 3)
    shadow_face_entity: jnp.ndarray = None  # (Ts,) int32
    # kernel-attrs mode (RenderOptions.kernel_attrs): per-ENTITY flat
    # material table — base_color(3), rough(1), metal(1), emission(3),
    # edge_id(1). Valid only when flat_eligible: every model's
    # per-vertex material streams are constant and untextured/un-fBm'd,
    # so the raster kernel can interpolate normals in its d0/d1/s slots
    # and ALL other attributes come from one one-hot MXU lookup — no
    # per-pixel attr-table gather (the dominant HBM term of the
    # composed frame).
    ent_flat: jnp.ndarray = None            # (E, 9)
    flat_eligible: bool = False             # static (host) eligibility
    # static/dynamic shadow split (build_render_tables
    # entity_shadow_static=): STATIC casters (terrain, trees — no
    # physics body, never toggled) live in this separate stream, baked
    # ONCE into a bounds-fit light atlas (pipeline.bake_static_shadow);
    # the per-frame/per-env CSM passes then raster only the DYNAMIC
    # subset left in shadow_faces (testbed: 4.1k → ~0.2k records/env).
    # Shadow factors multiply (exact when static and dynamic occluders
    # don't overlap along the light ray).
    static_shadow_faces: jnp.ndarray = None   # (Tss, 3), load pose


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


def default_edge_ids(entity_active, body_is_char,
                     exclude=None) -> np.ndarray:
    """Per-entity edge-mode ids, assigned at scene load the way the
    reference assigns per-character solid ids (model.frag:109-125 +
    scene.c character slots): each character entity gets a distinct
    solid id 1..15 so character silhouettes outline against each other;
    everything else shares id 0; ``exclude`` marks entities whose
    pixels never edge (bit7, ENTITY3D_OUTLINE_EXCLUDE)."""
    e = np.zeros(len(entity_active), np.float32)
    sid = 1
    for i, (act, ch) in enumerate(zip(entity_active, body_is_char)):
        if act and ch:
            e[i] = float(sid)
            sid = sid % 15 + 1
    if exclude is not None:
        e = e + 128.0 * np.asarray(exclude, np.float32)
    return e


def shadow_static_mask(entities, platform_group=None) -> np.ndarray:
    """Default static-shadow-caster mask from EntityParams: entities
    with no physics body and no character capsule never move, so their
    shadows can bake once (terrain chunks, trees).

    platform_group: optional (E,) int32 from GameConfig — entities in a
    switch-driven platform group (id >= 0) toggle visibility at play
    time, so they stay DYNAMIC casters. Scenes with other bodiless
    toggling entities must clear those slots themselves."""
    m = np.asarray(entities.active) \
        & (np.asarray(entities.body) < 0) \
        & ~np.asarray(entities.body_is_char)
    if platform_group is not None:
        m = m & ~(np.asarray(platform_group) >= 0)
    return m


def build_render_tables(models: list[ModelData], entity_model: np.ndarray,
                        entity_active: np.ndarray,
                        entity_edge_id: np.ndarray = None,
                        entity_shadow_static: np.ndarray = None
                        ) -> RenderTables:
    """Instance-expand models over active entity slots (host).

    entity_edge_id: optional (E,) f32 per-entity solid-id/exclude packing
    (see default_edge_ids) — expanded to a per-vertex stream so
    assemble_scene_geometry can emit SceneGeometry.edge_id.

    entity_shadow_static: optional (E,) bool — entities whose transform
    AND visibility never change (see shadow_static_mask). Their
    coarsest-LOD faces move to ``static_shadow_faces`` (baked once,
    pipeline.bake_static_shadow); the per-env ``shadow_faces`` stream
    keeps only dynamic casters."""
    vs, ns, bc, rm, em, ve = [], [], [], [], [], []
    uvs, tgs, tids, fbms, eids = [], [], [], [], []
    fs, fe, fl = [], [], []
    E = len(entity_model)
    aabbs = np.zeros((E, 2, 3), np.float32)
    ent_flat = np.zeros((E, 9), np.float32)
    flat_eligible = not any(
        m.uv is not None or m.tex_id >= 0 or m.mat_fbm is not None
        for m in models)
    voff = 0
    any_material = any(
        m.uv is not None or m.tex_id >= 0 or m.mat_fbm is not None
        for m in models)
    for ei, (mi, act) in enumerate(zip(entity_model, entity_active)):
        if not act:
            continue
        m = models[int(mi)]
        V = len(m.verts)
        if V == 0:
            continue    # render-empty entity (e.g. gameplay-only slot)
        # kernel-attrs eligibility: material streams constant per model
        if (np.ptp(m.base_color, axis=0).max(initial=0.0) > 0
                or np.ptp(m.rough_metal, axis=0).max(initial=0.0) > 0
                or np.ptp(m.emission, axis=0).max(initial=0.0) > 0):
            flat_eligible = False
        else:
            ent_flat[ei, 0:3] = m.base_color[0]
            ent_flat[ei, 3:5] = m.rough_metal[0]
            ent_flat[ei, 5:8] = m.emission[0]
            if entity_edge_id is not None:
                ent_flat[ei, 8] = float(entity_edge_id[ei])
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
        if entity_edge_id is not None:
            eids.append(np.full(V, float(entity_edge_id[ei]), np.float32))
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
    # static shadow-caster subset: coarsest LOD per entity
    fe_np = np.concatenate(fe) if fe else np.zeros((0,), np.int32)
    fl_np = np.concatenate(fl) if fl else np.zeros((0,), np.int32)
    fs_np = (np.concatenate(fs).astype(np.int32) if fs
             else np.zeros((0, 3), np.int32))
    coarse = np.zeros(len(entity_model), np.int64)
    np.maximum.at(coarse, fe_np, fl_np)
    ssel = fl_np == coarse[fe_np]
    sta_faces = None
    if entity_shadow_static is not None:
        sta = np.asarray(entity_shadow_static, bool)
        sta_sel = ssel & sta[fe_np]
        sta_faces = jnp.asarray(fs_np[sta_sel])
        ssel = ssel & ~sta[fe_np]      # dynamic casters only
    return RenderTables(
        verts=cat(vs), normals=cat(ns), base_color=cat(bc),
        rough_metal=cat(rm), emission=cat(em),
        uv=cat(uvs), tangent=cat(tgs), tex_id=cat(tids),
        mat_fbm=cat(fbms), any_material=any_material,
        vert_entity=cat(ve, np.int32).astype(jnp.int32),
        faces=jnp.asarray(fs_np),
        face_entity=cat(fe, np.int32).astype(jnp.int32),
        face_lod=cat(fl, np.int32).astype(jnp.int32),
        entity_aabb=jnp.asarray(aabbs),
        ent_max_lod=jnp.asarray(coarse.astype(np.int32)),
        edge_id=cat(eids) if entity_edge_id is not None else None,
        shadow_faces=jnp.asarray(fs_np[ssel]),
        shadow_face_entity=jnp.asarray(fe_np[ssel].astype(np.int32)),
        ent_flat=jnp.asarray(ent_flat),
        flat_eligible=bool(flat_eligible),
        static_shadow_faces=sta_faces,
    )


def bake_static_shadow(rt: RenderTables, entity_mx0, light_dir,
                       shadow_size: int = 1024, far: float = 200.0):
    """Render the STATIC casters' shadow atlas ONCE (host/session
    setup): a single bounds-fit ortho light view over the static
    geometry at its load pose. Static geometry + a fixed directional
    light = a constant shadow map, so the per-frame/per-env CSM passes
    only raster the dynamic stream (rt.shadow_faces) and the model pass
    MULTIPLIES the two shadow factors (render_frame static_shadow=).

    The reference re-renders every caster into every cascade each frame
    (pipeline-builder.c shadow passes); the split trades cascade
    locality on static geometry for removing ~95% of per-env shadow
    records — the bounds atlas is rendered at ``shadow_size`` (default
    1024 ≥ 4× the composed bench's per-cascade 256) to compensate.

    Returns (moments (1, S, S, 2), mvps (1, 4, 4), cascade_dists (1,))
    — the render_frame ``static_shadow`` triple."""
    from .pipeline import RenderOptions, SceneGeometry, shadow_pass_all
    from .view import bounds_light_subview

    if rt.static_shadow_faces is None or rt.static_shadow_faces.shape[0] == 0:
        raise ValueError("no static shadow stream: build_render_tables "
                         "needs entity_shadow_static")
    # static index of the casters' vertices (host-known subset)
    used = np.zeros(int(rt.verts.shape[0]), bool)
    used[np.asarray(rt.static_shadow_faces).reshape(-1)] = True
    used_idx = jnp.asarray(np.nonzero(used)[0].astype(np.int32))
    T = rt.static_shadow_faces
    opts = RenderOptions(shadow_size=shadow_size)

    # ONE jitted program (not eager op-by-op): a big static scene's bake
    # is compile-dominated the first time, and the persistent
    # compilation cache makes every later bake of the same shapes a pure
    # execute — "bake once" costs seconds warm, not minutes
    def _bake(mx0, ldir):
        packed = mx0[:, :3, :].reshape(mx0.shape[0], 12)
        g = packed[rt.vert_entity]
        m = g.reshape(-1, 3, 4)
        wverts = jnp.einsum("vij,vj->vi", m[:, :, :3], rt.verts) \
            + m[:, :, 3]
        wsub = wverts[used_idx]
        sv, cd = bounds_light_subview(wsub.min(0) - 1.0, wsub.max(0) + 1.0,
                                      ldir, far=far)
        ones_t = jnp.ones((T.shape[0],), bool)
        zeros_v = jnp.zeros_like(wverts)
        geom = SceneGeometry(
            verts=wverts, normals=zeros_v, faces=T, face_valid=ones_t,
            base_color=zeros_v, rough_metal=zeros_v[:, :2],
            emission=zeros_v, shadow_faces=T, shadow_face_valid=ones_t)
        moments = shadow_pass_all(opts, geom, sv.view, sv.proj)
        mvps = jnp.einsum("cij,cjk->cik", sv.proj, sv.view)
        return moments, mvps, cd

    return jax.jit(_bake)(entity_mx0, light_dir)


def kernel_attrs_ok(rt: RenderTables) -> bool:
    """Static eligibility for RenderOptions.kernel_attrs over these
    tables: flat per-entity materials AND the float tid-packing limit
    (2T·stride < 2^24 exactness, stride = the adaptive power-of-two
    covering E). Callers gate the option on this so bigger scenes fall
    back to the gather path instead of raising."""
    from .raster import ent_pack_stride

    stride = ent_pack_stride(rt.entity_aabb.shape[0])
    return bool(rt.flat_eligible
                and 2 * rt.faces.shape[0] * stride < 1 << 24)


def assemble_scene_geometry_batch(rt: RenderTables, entity_mx,
                                  entity_visible, cam_planes, cam_pos,
                                  skip_culling=None):
    """Per-ENV-BATCH geometry assembly for composed step+render: B envs,
    each with its own entity transforms/visibility/camera, over ONE
    shared instance table.

    The per-env twist on ``assemble_scene_geometry`` is gather shape:
    under vmap, ``packed[rt.vert_entity]`` becomes a batched-OPERAND
    gather (~5× slower than shared-table gathers on TPU), so every
    entity-indexed selection here is a one-hot MXU matmul instead
    (exact under HIGHEST precision), and all per-pixel attribute tables
    stay SHARED: normals/tangents are kept model-local and the model
    pass rotates them per pixel via (face_entity, ent_rot).

    entity_mx: (B, E, 4, 4); entity_visible: (B, E);
    cam_planes: (B, 6, 4); cam_pos: (B, 3).

    Returns (geom, axes): a SceneGeometry with batched leaves where
    per-env and shared leaves elsewhere, plus the matching in_axes tree
    for ``jax.vmap(render_frame)``-style consumption.
    """
    B, E = entity_mx.shape[:2]
    vi = rt.verts.shape[0]
    hi = jax.lax.Precision.HIGHEST

    # per-vertex world transform rows via one-hot selection (B, Vi, 12)
    oh_v = (rt.vert_entity[:, None] == jnp.arange(E)[None, :]
            ).astype(jnp.float32)                        # (Vi, E) const
    packed = entity_mx[:, :, :3, :].reshape(B, E, 12)
    g = jnp.einsum("ve,bec->bvc", oh_v, packed, precision=hi)
    # apply the selected 3×4 rows via fused slices — a (B, Vi, 3, 4)
    # reshape would lane-pad (3, 4) → (8, 128) when materialized
    vx, vy, vz = rt.verts[:, 0], rt.verts[:, 1], rt.verts[:, 2]
    wverts = jnp.stack(
        [g[..., 4 * i] * vx + g[..., 4 * i + 1] * vy
         + g[..., 4 * i + 2] * vz + g[..., 4 * i + 3] for i in range(3)],
        axis=-1)

    # per-entity world AABB cull + distance LOD (per env)
    c = 0.5 * (rt.entity_aabb[:, 0] + rt.entity_aabb[:, 1])
    e = 0.5 * (rt.entity_aabb[:, 1] - rt.entity_aabb[:, 0])
    rot = entity_mx[:, :, :3, :3]
    wc = jnp.einsum("beij,ej->bei", rot, c) + entity_mx[:, :, :3, 3]
    we = jnp.einsum("beij,ej->bei", jnp.abs(rot), e)
    in_frustum = jax.vmap(aabb_in_frustum)(cam_planes, wc - we, wc + we)
    if skip_culling is not None:
        in_frustum = in_frustum | skip_culling[None, :]
    dist = jnp.linalg.norm(wc - cam_pos[:, None, :], axis=-1)
    lod = jnp.sum(dist[..., None] > jnp.asarray(LOD_DISTANCES)[None, None, :],
                  axis=-1).astype(jnp.int32)
    lod = jnp.minimum(lod, LOD_MAX - 1)
    if rt.ent_max_lod is not None:   # clamp to each entity's own chain
        lod = jnp.minimum(lod, rt.ent_max_lod[None, :])
    ent_ok = entity_visible & in_frustum                  # (B, E)

    # face validity: entity-ok AND lod match, as ONE one-hot matmul over
    # the (E · LOD_MAX) product table
    n_lod = LOD_MAX
    oh_f = ((rt.face_entity[:, None, None] == jnp.arange(E)[None, :, None])
            & (rt.face_lod[:, None, None]
               == jnp.arange(n_lod)[None, None, :])
            ).reshape(rt.faces.shape[0], E * n_lod).astype(jnp.float32)
    ok_el = (ent_ok[..., None]
             & (lod[..., None] == jnp.arange(n_lod)[None, None, :]))
    fv = jnp.einsum("tk,bk->bt", oh_f,
                    ok_el.reshape(B, E * n_lod).astype(jnp.float32),
                    precision=hi) > 0.5

    # shadow-caster stream: the STATIC coarsest-LOD face subset
    # (rt.shadow_faces), visibility-only validity (off-screen casters
    # still cast). One-hot keeps it a matmul, not a batched gather.
    oh_sh = (np.asarray(rt.shadow_face_entity)[:, None]
             == np.arange(E)[None, :]).astype(np.float32)
    sfv = jnp.einsum("te,be->bt", jnp.asarray(oh_sh),
                     entity_visible.astype(jnp.float32),
                     precision=hi) > 0.5

    geom = SceneGeometry(
        shadow_faces=rt.shadow_faces,
        shadow_face_valid=sfv,
        verts=wverts, normals=rt.normals, faces=rt.faces, face_valid=fv,
        base_color=rt.base_color, rough_metal=rt.rough_metal,
        emission=rt.emission,
        uv=rt.uv if rt.any_material else None,
        tangent=rt.tangent if rt.any_material else None,
        tex_id=rt.tex_id if rt.any_material else None,
        local_pos=rt.verts if rt.any_material else None,
        mat_fbm=rt.mat_fbm if rt.any_material else None,
        edge_id=rt.edge_id,
        face_entity=rt.face_entity, ent_rot=rot,
        ent_flat=rt.ent_flat if rt.flat_eligible else None,
    )
    axes = SceneGeometry(
        verts=0, normals=None, faces=None, face_valid=0,
        base_color=None, rough_metal=None, emission=None,
        uv=None, tangent=None, tex_id=None, local_pos=None, mat_fbm=None,
        edge_id=None, face_entity=None, ent_rot=0,
        shadow_faces=None, shadow_face_valid=0, ent_flat=None,
    )
    return geom, axes


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
    if rt.ent_max_lod is not None:   # clamp to each entity's own chain
        lod = jnp.minimum(lod, rt.ent_max_lod)

    ent_ok = entity_visible & in_frustum
    fv = ent_ok[rt.face_entity] & (rt.face_lod == lod[rt.face_entity])

    # shadow-caster stream: the STATIC coarsest-LOD subset, visibility
    # only (see the batched variant for rationale)
    sfv = entity_visible[rt.shadow_face_entity]

    if not rt.any_material:
        return SceneGeometry(
            verts=wverts, normals=wnorm, faces=rt.faces, face_valid=fv,
            base_color=rt.base_color, rough_metal=rt.rough_metal,
            emission=rt.emission, edge_id=rt.edge_id,
            shadow_faces=rt.shadow_faces, shadow_face_valid=sfv,
        )
    return SceneGeometry(
        verts=wverts, normals=wnorm, faces=rt.faces, face_valid=fv,
        base_color=rt.base_color, rough_metal=rt.rough_metal,
        emission=rt.emission, uv=rt.uv, tangent=wtan, tex_id=rt.tex_id,
        local_pos=rt.verts, mat_fbm=rt.mat_fbm, edge_id=rt.edge_id,
        shadow_faces=rt.shadow_faces, shadow_face_valid=sfv,
    )
