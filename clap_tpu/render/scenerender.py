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
    # --- cluster record tables (assemble_cluster_records_batch) ---
    # Face blocks are padded per (entity, LOD) to CLUSTER multiples, so
    # every binning cluster is (entity, LOD)-PURE: per-env face validity
    # collapses to ONE value per cluster and the whole per-env record
    # pipeline (validity, compaction, corner fetch, world+clip
    # transform) runs on ~T/8 cluster rows instead of member rows. The
    # pad faces are degenerate (v, v, v) — zero area, self-masking in
    # the record builders.
    cl_entity: jnp.ndarray = None   # (Tc,) int32 — the cluster's entity
    cl_lod: jnp.ndarray = None      # (Tc,) int32 — the cluster's LOD
    # rest-pose cluster AABB (center xyz, extent xyz): the per-cluster
    # frustum cull runs at Tc rows BEFORE compaction, so offscreen
    # terrain/sub-chunk clusters never reach the record pipeline at all
    cl_aabb: jnp.ndarray = None     # (Tc, 6) f32
    # rest-pose corner rows, one row per cluster: 18 component groups
    # [corner c ∈ (v0,v1,v2)][comp k ∈ (x,y,z,nx,ny,nz)] × CLUSTER
    # members — col = (6c + k)·CLUSTER + m. Gathering a kept cluster
    # fetches all 24 corners (pos + model-local normal) in ONE row.
    cl_rest: jnp.ndarray = None     # (Tc, 18·CLUSTER) f32
    # dynamic shadow stream corner expansion (record order v0, v2, v1)
    # + per-corner entity — per-env world shadow corners come from one
    # one-hot MXU transform of these rows, so the batched path never
    # materializes a (B, Vi) world-vertex table at all.
    shadow_corner_rest: jnp.ndarray = None    # (3·Ts, 3)
    shadow_corner_entity: jnp.ndarray = None  # (3·Ts,) int32


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
    fs, fe, fl, fp = [], [], [], []
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
            # pad each (entity, LOD) block to a CLUSTER multiple with
            # degenerate (v, v, v) faces so binning clusters never
            # straddle blocks — cluster purity is what lets the batched
            # assembly run validity/compaction/transforms at cluster
            # granularity (degenerate pads have zero area and are
            # rejected by the record builders on their own)
            from .raster import CLUSTER

            n = len(faces)
            pad = (-n) % CLUSTER
            fs.append(faces.astype(np.int64) + voff)
            if pad:
                fs.append(np.full((pad, 3), voff, np.int64))
            fe.append(np.full(n + pad, ei, np.int32))
            fl.append(np.full(n + pad, lod, np.int32))
            fp.append(np.arange(n + pad) >= n)   # pad-face mask
        aabbs[ei, 0] = m.verts.min(0)
        aabbs[ei, 1] = m.verts.max(0)
        voff += len(m.verts)
    cat = lambda xs, d=np.float32: jnp.asarray(  # noqa: E731
        np.concatenate(xs) if xs else np.zeros((0,), d))
    # static shadow-caster subset: coarsest LOD per entity (pad faces
    # are degenerate placeholders for cluster purity — keep them OUT of
    # the member-granularity shadow streams)
    fe_np = np.concatenate(fe) if fe else np.zeros((0,), np.int32)
    fl_np = np.concatenate(fl) if fl else np.zeros((0,), np.int32)
    fp_np = np.concatenate(fp) if fp else np.zeros((0,), bool)
    fs_np = (np.concatenate(fs).astype(np.int32) if fs
             else np.zeros((0, 3), np.int32))
    coarse = np.zeros(len(entity_model), np.int64)
    np.maximum.at(coarse, fe_np, fl_np)
    ssel = (fl_np == coarse[fe_np]) & ~fp_np
    sta_faces = None
    if entity_shadow_static is not None:
        sta = np.asarray(entity_shadow_static, bool)
        sta_sel = ssel & sta[fe_np]
        sta_faces = jnp.asarray(fs_np[sta_sel])
        ssel = ssel & ~sta[fe_np]      # dynamic casters only

    # cluster record tables: blocks are CLUSTER-padded above, so every
    # cluster is (entity, LOD)-pure
    from .raster import CLUSTER

    cl_entity = cl_lod = cl_rest = cl_aabb = None
    sc_rest = sc_ent = None
    if fs_np.shape[0] > 0:
        Tn = fs_np.shape[0]
        assert Tn % CLUSTER == 0
        Tcn = Tn // CLUSTER
        cl_e = fe_np.reshape(Tcn, CLUSTER)
        cl_l = fl_np.reshape(Tcn, CLUSTER)
        assert (cl_e == cl_e[:, :1]).all() and (cl_l == cl_l[:, :1]).all(), \
            "face blocks not cluster-pure"
        cl_entity = jnp.asarray(cl_e[:, 0])
        cl_lod = jnp.asarray(cl_l[:, 0])
        vcat = np.concatenate(vs)
        ncat = np.concatenate(ns)
        comps = []
        for c in range(3):
            p = vcat[fs_np[:, c]]
            q = ncat[fs_np[:, c]]
            comps += [p[:, 0], p[:, 1], p[:, 2], q[:, 0], q[:, 1], q[:, 2]]
        stk = np.stack(comps)                    # (18, T)
        cl_rest = jnp.asarray(
            stk.reshape(18, Tcn, CLUSTER).transpose(1, 0, 2)
               .reshape(Tcn, 18 * CLUSTER))
        # rest-pose cluster AABBs (pad corners are real model verts —
        # they only ever tighten nothing / stay inside)
        cxyz = stk[[0, 1, 2, 6, 7, 8, 12, 13, 14]].reshape(
            3, 3, Tcn, CLUSTER)                  # (corner, xyz, Tc, m)
        cmin = cxyz.min(axis=(0, 3)).T           # (Tc, 3)
        cmax = cxyz.max(axis=(0, 3)).T
        cl_aabb = jnp.asarray(np.concatenate(
            [(cmin + cmax) * 0.5, (cmax - cmin) * 0.5], axis=1))
        # dynamic shadow stream corner expansion (record order v0,v2,v1)
        sfaces_np = fs_np[ssel]
        sc_rest = jnp.asarray(vcat[sfaces_np[:, [0, 2, 1]].reshape(-1)])
        sc_ent = jnp.asarray(np.repeat(fe_np[ssel], 3).astype(np.int32))
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
        cl_entity=cl_entity, cl_lod=cl_lod, cl_rest=cl_rest,
        cl_aabb=cl_aabb,
        shadow_corner_rest=sc_rest, shadow_corner_entity=sc_ent,
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


def _entity_cull_lod(rt: RenderTables, entity_mx, entity_visible,
                     cam_planes, cam_pos, skip_culling=None,
                     lod_scale: float = 1.0):
    """Per-env per-entity frustum cull + distance LOD (the shared front
    half of both batched assembly paths). Returns (ent_ok (B, E) bool,
    lod (B, E) int32, rot (B, E, 3, 3)).

    lod_scale multiplies LOD_DISTANCES — constant screen-space-error
    selection: the 30/60/120 m defaults are the 720p design point
    (model.c:975-998 selects by fixed distance at the reference's
    window size), so a 256² target passes ~height/720 and switches
    proportionally closer, keeping pixels-per-triangle roughly
    constant."""
    c = 0.5 * (rt.entity_aabb[:, 0] + rt.entity_aabb[:, 1])
    e = 0.5 * (rt.entity_aabb[:, 1] - rt.entity_aabb[:, 0])
    rot = entity_mx[:, :, :3, :3]
    wc = jnp.einsum("beij,ej->bei", rot, c) + entity_mx[:, :, :3, 3]
    we = jnp.einsum("beij,ej->bei", jnp.abs(rot), e)
    in_frustum = jax.vmap(aabb_in_frustum)(cam_planes, wc - we, wc + we)
    if skip_culling is not None:
        in_frustum = in_frustum | skip_culling[None, :]
    dist = jnp.linalg.norm(wc - cam_pos[:, None, :], axis=-1)
    dists = jnp.asarray(LOD_DISTANCES) * lod_scale
    lod = jnp.sum(dist[..., None] > dists[None, None, :],
                  axis=-1).astype(jnp.int32)
    lod = jnp.minimum(lod, LOD_MAX - 1)
    if rt.ent_max_lod is not None:   # clamp to each entity's own chain
        lod = jnp.minimum(lod, rt.ent_max_lod[None, :])
    return entity_visible & in_frustum, lod, rot


def assemble_cluster_records_batch(rt: RenderTables, entity_mx,
                                   entity_visible, cam_planes, cam_pos,
                                   views, proj, cap: int = 24576,
                                   skip_culling=None,
                                   cluster_cull: bool = True,
                                   char_skin=None, joint_mats=None,
                                   lod_scale: float = 1.0):
    """Cluster-granularity batched assembly for the kernel_attrs
    composed path — the record pipeline's front end at ~T/8 rows.

    The r3 path did per-env work at MEMBER granularity: a (Ti, E·LOD)
    one-hot validity matmul, a (B, Vi) world-vertex transform, member
    compaction gathers, and a 3T-row per-env corner gather — together
    ~12 ms of the 16-env composed trace (gather rows at ~5-10 ns/row
    dominate; see ROUND_NOTES). Because face blocks are (entity, LOD)-
    pure per cluster (build_render_tables pads them), ALL of that
    collapses to cluster rows:

      1. cluster validity = ok_el[cl_entity, cl_lod] — one Tc-row
         gather of the per-env (E·LOD) table (moveaxis fast path),
      2. valid-first compaction sorts Tc keys and keeps cap/CLUSTER
         cluster ids,
      3. ONE shared-table gather fetches each kept cluster's 24
         rest-pose corners (+ model-local normals) as a single row,
      4. the world+clip transform is applied directly to those corner
         columns with per-cluster matrices selected by one one-hot MXU
         matmul: F = (proj·view)·entity_mx.

    No (B, Vi) vertex table, no member gathers, no per-env corner
    gather. The output feeds clip_near_records(components=…) — fully
    columnar, zero gathers downstream until the per-tile record fetch.

    Returns (geom, axes) like assemble_scene_geometry_batch; the
    SceneGeometry carries ``comp``/``comp_valid``/``comp_ent`` and a
    per-env world-space ``shadow_corner_verts`` stream instead of
    verts/faces. Requires rt.flat_eligible (kernel_attrs mode).

    char_skin + joint_mats ((B, C, J, 4, 4)): render SKINNED characters
    (charskin.py — model.vert:34-48 parity). The char entities' rigid
    clusters are statically masked out of the validity pass and an
    LBS-deformed per-env record range (C·Tp clip-component columns)
    concatenates onto the compacted rigid stream; the chars' rows of
    the dynamic shadow corner stream are overwritten with skinned
    corners.
    """
    from .raster import CLUSTER

    if rt.cl_rest is None or not rt.flat_eligible:
        raise ValueError("cluster records need cl_rest tables and "
                         "flat-eligible materials (kernel_attrs mode)")
    from ..ops.gatherx import gather_rows

    B, E = entity_mx.shape[:2]
    hi = jax.lax.Precision.HIGHEST
    L = LOD_MAX
    ent_ok, lod, rot = _entity_cull_lod(rt, entity_mx, entity_visible,
                                        cam_planes, cam_pos, skip_culling,
                                        lod_scale)
    ok_el = (ent_ok[..., None]
             & (lod[..., None] == jnp.arange(L)[None, None, :]))  # (B,E,L)

    # 1. cluster validity: per-env table, STATIC cluster index — the
    # (E·L, B)-transposed gather keeps rows shared across envs
    idx = rt.cl_entity * L + rt.cl_lod                    # (Tc,) static
    okT = ok_el.reshape(B, E * L).T                       # (E·L, B)
    cv = gather_rows(okT, idx).T                          # (B, Tc)
    if char_skin is not None:
        # skinned chars: their rigid clusters never raster — the
        # skinned record range below replaces them (static mask)
        cl_skinned = jnp.asarray(np.isin(
            np.asarray(rt.cl_entity), np.asarray(char_skin.char_ents)))
        cv = cv & ~cl_skinned[None, :]
    Tc = idx.shape[0]
    capc = min(cap // CLUSTER, Tc)

    if cluster_cull and rt.cl_aabb is not None:
        # 1b. per-CLUSTER frustum cull at Tc rows, BEFORE compaction:
        # the entity cull keeps a partially-visible entity whole, so a
        # horizon terrain chunk drags every offscreen sub-cluster
        # through clip/binning/sort. Rest AABBs ride one static one-hot
        # MXU transform; conservative p-vertex plane test (the record
        # builders would mark these records dead anyway — this stops
        # paying for them; record SETS only shrink by already-dead rows,
        # so images are unchanged — test_cluster_records).
        oh_cl = jnp.asarray(
            (np.asarray(rt.cl_entity)[:, None]
             == np.arange(E)[None, :]).astype(np.float32))   # static
        packed = entity_mx[:, :, :3, :].reshape(B, E, 12)
        gm = jnp.einsum("te,bek->btk", oh_cl, packed,
                        precision=jax.lax.Precision.HIGHEST)  # (B,Tc,12)
        cc, ce = rt.cl_aabb[:, :3], rt.cl_aabb[:, 3:]
        wc = jnp.stack(
            [gm[..., 4 * i] * cc[:, 0] + gm[..., 4 * i + 1] * cc[:, 1]
             + gm[..., 4 * i + 2] * cc[:, 2] + gm[..., 4 * i + 3]
             for i in range(3)], axis=-1)                 # (B, Tc, 3)
        we = jnp.stack(
            [jnp.abs(gm[..., 4 * i]) * ce[:, 0]
             + jnp.abs(gm[..., 4 * i + 1]) * ce[:, 1]
             + jnp.abs(gm[..., 4 * i + 2]) * ce[:, 2]
             for i in range(3)], axis=-1)
        n = cam_planes[..., :3]                           # (B, 6, 3)
        d = cam_planes[..., 3]
        dist = jnp.einsum("bpk,btk->btp", n, wc) + d[:, None, :] \
            + jnp.einsum("bpk,btk->btp", jnp.abs(n), we)
        in_fr = jnp.all(dist >= 0.0, axis=-1)             # (B, Tc)
        if skip_culling is not None:
            scl = jnp.asarray(np.asarray(skip_culling)[
                np.asarray(rt.cl_entity)])                # static (Tc,)
            in_fr = in_fr | scl[None, :]
        cv = cv & in_fr

    # 2. valid-first stable compaction (preserves cluster order — the
    # binning sort's z-tiebreak order stays deterministic)
    ckey = (~cv).astype(jnp.uint32)
    cidx = jnp.broadcast_to(jnp.arange(Tc, dtype=jnp.int32)[None],
                            (B, Tc))
    _, sidx = jax.lax.sort((ckey, cidx), num_keys=1, is_stable=True)
    keep = sidx[:, :capc]                                 # (B, capc)
    nval = jnp.minimum(jnp.sum(cv, axis=-1), capc)        # (B,)
    kvalid = jnp.arange(capc)[None, :] < nval[:, None]    # (B, capc)

    # 3. fetch kept clusters' corner rows (shared table — fast path)
    rows = gather_rows(rt.cl_rest, keep)                  # (B, capc, 144)
    centi = gather_rows(rt.cl_entity, keep)               # (B, capc)

    # 4. per-cluster clip matrices via one-hot MXU selection
    vp = jnp.einsum("ij,bjk->bik", proj, views, precision=hi)
    F = jnp.einsum("bij,bejk->beik", vp, entity_mx,
                   precision=hi).reshape(B, E, 16)
    oh = (centi[..., None] == jnp.arange(E)[None, None, :]
          ).astype(jnp.float32)                           # (B, capc, E)
    fc = jnp.einsum("bce,bek->bkc", oh, F, precision=hi)  # (B, 16, capc)
    gt = rows.transpose(0, 2, 1)                          # (B, 144, capc)

    T = capc * CLUSTER
    components = []
    for c in range(3):
        cols = [[] for _ in range(7)]     # x, y, z, w, nx, ny, nz
        for m in range(CLUSTER):
            X = gt[:, (c * 6 + 0) * CLUSTER + m]
            Y = gt[:, (c * 6 + 1) * CLUSTER + m]
            Z = gt[:, (c * 6 + 2) * CLUSTER + m]
            for j in range(4):            # clip row j
                cols[j].append(fc[:, 4 * j + 0] * X + fc[:, 4 * j + 1] * Y
                               + fc[:, 4 * j + 2] * Z + fc[:, 4 * j + 3])
            for i in range(3):            # model-local normal passthrough
                cols[4 + i].append(gt[:, (c * 6 + 3 + i) * CLUSTER + m])
        components.append([
            jnp.stack(col, axis=-1).reshape(B, T) for col in cols])
    comp = jnp.stack([components[c][i] for c in range(3)
                      for i in range(7)], axis=1)         # (B, 21, T)
    comp_valid = jnp.repeat(kvalid, CLUSTER, axis=-1)     # (B, T)
    comp_ent = jnp.repeat(centi, CLUSTER, axis=-1)        # (B, T)

    # dynamic shadow stream: world corners from rest rows by one one-hot
    # transform (no (B, Vi) vertex table anywhere in this path)
    packed = entity_mx[:, :, :3, :].reshape(B, E, 12)
    oh_sc = (rt.shadow_corner_entity[:, None] == jnp.arange(E)[None, :]
             ).astype(jnp.float32)                        # (3Ts, E) const
    gs = jnp.einsum("se,bek->bsk", oh_sc, packed, precision=hi)
    scr = rt.shadow_corner_rest
    swc = jnp.stack(
        [gs[..., 4 * i] * scr[:, 0] + gs[..., 4 * i + 1] * scr[:, 1]
         + gs[..., 4 * i + 2] * scr[:, 2] + gs[..., 4 * i + 3]
         for i in range(3)], axis=-1)                     # (B, 3Ts, 3)
    oh_sh = (np.asarray(rt.shadow_face_entity)[:, None]
             == np.arange(E)[None, :]).astype(np.float32)
    sfv = jnp.einsum("te,be->bt", jnp.asarray(oh_sh),
                     entity_visible.astype(jnp.float32),
                     precision=hi) > 0.5

    if char_skin is not None:
        from .charskin import apply_shadow_skin, skin_records

        comp_s, valid_s, ent_s, sh_world = skin_records(
            char_skin, joint_mats, entity_mx, views, proj,
            entity_visible)
        comp = jnp.concatenate([comp, comp_s], axis=-1)
        comp_valid = jnp.concatenate([comp_valid, valid_s], axis=-1)
        comp_ent = jnp.concatenate([comp_ent, ent_s], axis=-1)
        swc = apply_shadow_skin(swc, char_skin, sh_world)

    zero3 = jnp.zeros((0, 3), jnp.float32)
    geom = SceneGeometry(
        verts=zero3, normals=zero3, faces=jnp.zeros((0, 3), jnp.int32),
        face_valid=jnp.zeros((0,), bool),
        base_color=zero3, rough_metal=zero3[:, :2], emission=zero3,
        comp=comp, comp_valid=comp_valid, comp_ent=comp_ent,
        ent_rot=rot, ent_flat=rt.ent_flat,
        shadow_faces=rt.shadow_faces, shadow_face_valid=sfv,
        shadow_corner_verts=swc,
    )
    axes = SceneGeometry(
        verts=None, normals=None, faces=None, face_valid=None,
        base_color=None, rough_metal=None, emission=None,
        comp=0, comp_valid=0, comp_ent=0, ent_rot=0, ent_flat=None,
        shadow_faces=None, shadow_face_valid=0, shadow_corner_verts=0,
    )
    return geom, axes


def assemble_scene_geometry_batch(rt: RenderTables, entity_mx,
                                  entity_visible, cam_planes, cam_pos,
                                  skip_culling=None, char_skin=None,
                                  joint_mats=None, lod_scale: float = 1.0):
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

    if char_skin is not None:
        # skinned chars (model.vert:34-48): the char entities' instance
        # vertex blocks are replaced with LBS-deformed world positions
        # (silhouettes + shadows exact). The per-pixel normals of this
        # path come from the SHARED model-local table rotated by
        # ent_rot, which a per-env deformation cannot ride — char
        # shading normals stay rest-pose here; the cluster-record path
        # (the flagship) interpolates the skinned normals exactly.
        from .charskin import skin_vertex_rows

        w_skin, _snl = skin_vertex_rows(char_skin, joint_mats, entity_mx)
        for c, r0 in enumerate(char_skin.vert_row0):
            wverts = jax.lax.dynamic_update_slice(
                wverts, w_skin[:, c], (0, r0, 0))

    ent_ok, lod, rot = _entity_cull_lod(rt, entity_mx, entity_visible,
                                        cam_planes, cam_pos, skip_culling,
                                        lod_scale)

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
                            skip_culling=None, char_skin=None,
                            joint_mats=None) -> SceneGeometry:
    """Per-frame geometry assembly: transform instance verts by entity
    matrices, cull per entity, select LOD per entity by distance
    (models_render model.c:969-998).

    char_skin + joint_mats ((C, J, 4, 4)): skinned characters — the
    char entities' vertex blocks are replaced with LBS-deformed world
    positions AND normals (both exact in this single-scene path;
    model.vert:34-48)."""
    # pack world matrices (E, 12) → one gather per vertex
    packed = entity_mx[:, :3, :].reshape(entity_mx.shape[0], 12)
    g = packed[rt.vert_entity]                            # (Vi, 12)
    m = g.reshape(-1, 3, 4)
    wverts = jnp.einsum("vij,vj->vi", m[:, :, :3], rt.verts) + m[:, :, 3]
    wnorm = jnp.einsum("vij,vj->vi", m[:, :, :3], rt.normals)
    wnorm = wnorm / jnp.maximum(
        jnp.linalg.norm(wnorm, axis=-1, keepdims=True), 1e-6)
    if char_skin is not None:
        from .charskin import skin_vertex_rows

        w_skin, snl = skin_vertex_rows(char_skin, joint_mats, entity_mx)
        emx = entity_mx[char_skin.char_ents]              # (C, 4, 4)
        wn = jnp.einsum("cij,cvj->cvi", emx[:, :3, :3], snl)
        wn = wn / jnp.maximum(
            jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-6)
        for c, r0 in enumerate(char_skin.vert_row0):
            wverts = jax.lax.dynamic_update_slice(wverts, w_skin[c],
                                                  (r0, 0))
            wnorm = jax.lax.dynamic_update_slice(wnorm, wn[c], (r0, 0))
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
