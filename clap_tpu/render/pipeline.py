"""Frame graph (reference: core/pipeline.c + pipeline-builder.c:182-613).

The reference builds a pass DAG of FBOs; here each pass is a pure
function over image arrays and the "graph" is ordinary function
composition, assembled according to RenderOptions — the analogue of the
~45-field runtime options struct (pipeline.h:15-57) that the reference
diff-checks to rebuild its pipeline (clap.c:453-524). Under jit, XLA
fuses the elementwise chains; disabled passes trace to nothing.

Canonical chain (pipeline-builder.c):
  4×CSM shadow (VSM moments) → model MRT (lighting/emission/normals/
  depth via the tile rasterizer + deferred shading) → bloom → edge
  (sobel|laplace) → SMAA blend-weights → SSAO → combine (fog, contrast,
  LUT, tonemap, grain, OETF).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import mathx as mx
from . import post, shade
from .lights import Lights, light_grid
from .raster import (GBuffer, assemble_tri_records, bin_triangles,
                     project_to_screen, rasterize)
from .view import CASCADES_MAX, cascade_subviews, make_subview


@dataclass(frozen=True)
class RenderOptions:
    """render_options (pipeline.h:15-57) — the subset that drives pass
    assembly. Static (trace-time) switches."""

    width: int = 1280
    height: int = 720
    shadow_size: int = 1024
    shadow_vsm: bool = True
    ssao: bool = True
    # "shift": gather-free fixed-tap AO (post.ssao_shift, the fast
    # default); "kernel": the reference's hemisphere-sample estimator
    # (ssao.c:81 parity, one 16·H·W-row gather per frame)
    ssao_mode: str = "shift"
    bloom: bool = True
    edge_aa: bool = True            # SMAA-lite
    edge_sobel: bool = True         # else laplace on depth
    lighting_lut: bool = False
    hdr: bool = False               # PQ output instead of sRGB
    bloom_intensity: float = 1.0
    bloom_threshold: float = 1.0
    lighting_exposure: float = 1.0
    contrast: float = 0.1
    fog_near: float = 80.0
    fog_far: float = 160.0
    fog_color: tuple = (0.58, 0.68, 0.78)
    record_compact: int = 0                 # fixed-capacity valid-first
                                            # face-stream compaction before
                                            # the record pipeline (composed
                                            # per-env scenes: LOD select +
                                            # culling leave the static
                                            # stream ~75% invalid, and masks
                                            # can't shorten what XLA walks).
                                            # 0 = off; set to a generous
                                            # bound on visible faces.
                                            # Valid faces beyond it DROP.
    internal_scale: int = 1                 # shading-rate lever: render
                                            # every 3D pass at (W/s, H/s)
                                            # and bilinear-upscale the final
                                            # LDR to (W, H). The frame cost
                                            # is ∝ internal pixels (raster
                                            # lattice math, G-buffer bytes,
                                            # shading, post), so s=2 buys
                                            # ~4× env-fps for a measured
                                            # PSNR cost (bench reports the
                                            # curve) — the escape hatch the
                                            # 4096-env × 60 Hz north star
                                            # needs on one chip (the HBM
                                            # bound analysis, ROUND_NOTES)
    model_msaa: int = 1                     # supersampled model pass
                                            # (render_options.model_msaa,
                                            # clap.c:453-465): the 3D frame
                                            # renders at f× resolution and
                                            # box-resolves down — the
                                            # TPU-native MSAA analogue (no
                                            # hardware resolve; coverage IS
                                            # shading here). Opposite lever
                                            # to internal_scale; both honor
                                            # the rebuild-on-diff contract
                                            # (static options retrace).
    shadow_msaa: int = 1                    # supersampled shadow atlas:
                                            # raster each cascade at f×
                                            # shadow_size and average-pool
                                            # the VSM moments (moments are
                                            # linear in coverage, so the
                                            # pool IS the multisample
                                            # resolve — pipeline-builder.c
                                            # :245-308 shadow_msaa)
    fog_noise: bool = False                 # 3D-noise-modulated fog color
                                            # in combine (combine.frag:35-48)
                                            # — the noise field is evaluated
                                            # analytically (ops/noise.py),
                                            # not gathered from a volume
    material_fog: bool = False              # use_3d_fog surface fog blend
                                            # (lighting.glsl:209-213)
    fog_3d_amp: float = 1.0                 # fog_cloud amplitude
    fog_3d_scale: float = 0.05              # fog_cloud frequency
    film_grain: float = 0.03
    tonemap_aces: bool = True
    shadow_outline_threshold: float = 0.5   # shadow-boundary outline flip
                                            # (model.frag:109-125)
    outline_strength: float = 0.35          # cartoon-outline darkening in
                                            # combine (0 = off)
    raster_cap: int = 0                     # per-tile triangle capacity for
                                            # the model pass (0 = policy
                                            # default; dense 100k+ tri scenes
                                            # saturate the 1024 default and
                                            # the depth-ordered cap silently
                                            # drops the farthest clusters)
    attr_bf16: bool = False                 # store the per-pixel attr-gather
                                            # table in bf16: the gather output
                                            # is lane-padded to 128 cols, so
                                            # dtype is the only lever on its
                                            # HBM bytes (2×); exact for ids
                                            # < 256, ~0.4% on normals/colors
    kernel_attrs: bool = False              # interpolate normals in the
                                            # raster kernel's d0/d1/s slots
                                            # and take all other attributes
                                            # from a per-entity flat table
                                            # (geom.ent_flat) — NO per-pixel
                                            # attr gather at all. Requires
                                            # local-attrs mode geometry with
                                            # flat-eligible materials (see
                                            # RenderTables.flat_eligible)


class SceneGeometry(NamedTuple):
    """Device-side render geometry for one scene: merged vertex/face
    buffers (world space baked per frame by the caller) + materials."""

    verts: jnp.ndarray      # (V, 3) world-space positions
    normals: jnp.ndarray    # (V, 3)
    faces: jnp.ndarray      # (T, 3) int32
    face_valid: jnp.ndarray  # (T,) bool
    base_color: jnp.ndarray  # (V, 3) per-vertex base color
    rough_metal: jnp.ndarray  # (V, 2)
    emission: jnp.ndarray   # (V, 3)
    uv: jnp.ndarray = None  # (V, 2) texcoords (optional, for texturing)
    tangent: jnp.ndarray = None   # (V, 4) xyz + handedness w (model.vert:54-67)
    tex_id: jnp.ndarray = None    # (V,) f32 texture-set layer, -1 untextured
    local_pos: jnp.ndarray = None  # (V, 3) model-local pos (material fBm
                                   # samples LOCAL space, lighting.glsl:20-50)
    mat_fbm: jnp.ndarray = None   # (V, 6) amp, scale, rough_floor,
                                  # rough_ceil, metal_floor, metal_ceil
    edge_id: jnp.ndarray = None   # (V,) f32 solid id (0-15) + 128·exclude
                                  # — the RT2 alpha edge-mode packing
                                  # (model.frag:109-125)
    # --- local-attrs mode (batched per-env dynamic scenes): when
    # ent_rot is present, ``normals``/``tangent`` are MODEL-LOCAL and
    # SHARED across the env batch; the model pass rotates them per pixel
    # by the entity rotation looked up through face_entity. This keeps
    # every per-pixel attribute table view-invariant — a per-env table
    # turns the image gather into a batched-operand gather (~5× slower).
    face_entity: jnp.ndarray = None  # (T,) int32 entity per face (shared)
    ent_rot: jnp.ndarray = None      # (E, 3, 3) entity rotation (per env)
    # dedicated shadow-caster stream: a STATIC coarsest-LOD-per-entity
    # face subset (RenderTables.shadow_faces) with visibility-only
    # validity (no camera frustum — off-screen casters still cast).
    # Falls back to faces/face_valid when absent. Static subsetting is
    # what shrinks the record pipeline: per-env masks can't shorten the
    # stream XLA walks (62k → 4.1k records on the composed testbed).
    shadow_faces: jnp.ndarray = None       # (Ts, 3)
    shadow_face_valid: jnp.ndarray = None  # (Ts,)
    # kernel-attrs mode (opts.kernel_attrs): per-entity flat material
    # table (E, 9) — base(3), rough, metal, emission(3), edge_id —
    # consumed when every non-normal attribute is per-entity constant
    # (RenderTables.flat_eligible); see model_pass.
    ent_flat: jnp.ndarray = None           # (E, 9), shared
    # corner-expanded streams (STATIC world geometry only): vertices
    # pre-permuted into per-corner order so the per-frame record build
    # transforms 3T rows instead of gathering them (~7-10 ns/row — the
    # corner gather was 8.7 ms of the 44 ms dense-720p device trace).
    # corner_verts/_normals: corner-MAJOR over ``faces``
    # (raster.expand_corners_major, clip_near_records layout);
    # shadow_corner_verts: RECORD order over the shadow stream
    # (raster.expand_corners_record, assemble_tri_records layout).
    corner_verts: jnp.ndarray = None         # (3T, 3)
    corner_normals: jnp.ndarray = None       # (3T, 3)
    shadow_corner_verts: jnp.ndarray = None  # (3Ts, 3)
    # cluster-record mode (scenerender.assemble_cluster_records_batch):
    # per-corner CLIP-space component columns [corner c][x,y,z,w,nx,ny,
    # nz] — the record pipeline's input already built at cluster
    # granularity; verts/faces are unused (empty) in this mode and the
    # surface stage calls clip_near_records(components=…) directly.
    # kernel_attrs only.
    comp: jnp.ndarray = None        # (21, T) f32
    comp_valid: jnp.ndarray = None  # (T,) bool
    comp_ent: jnp.ndarray = None    # (T,) int32 face entity


class TextureSets(NamedTuple):
    """Per-model texture layers (model3dtx's diffuse/normal/emission set,
    model.h:213-223) as stacked arrays indexed by SceneGeometry.tex_id."""

    diffuse: jnp.ndarray          # (L, S, S, 3)
    normal: jnp.ndarray = None    # (L, S, S, 3) tangent-space, [0,1]
    emission: jnp.ndarray = None  # (L, S, S, 3)
    # terrain atlas mode (terrain.frag:39-46): layers flagged here treat
    # diffuse as a 2×2 atlas — grass in the lower-left quadrant, rock at
    # +0.5 — blended per pixel by slope: fac = max(N·up, 0)^4
    slope_blend: jnp.ndarray = None   # (L,) bool


def clip_transform(verts, view, proj):
    vp = proj @ view
    v4 = jnp.concatenate([verts, jnp.ones_like(verts[..., :1])], -1)
    return jnp.einsum("ij,vj->vi", vp, v4)


def shadow_pass(opts: RenderOptions, geom: SceneGeometry, light_view,
                light_proj):
    """One cascade: depth-only raster → linearized VSM moments (d, d²)
    (shadow_vsm.frag:8-13)."""
    from .raster import rasterize_depth

    s = opts.shadow_size
    # shadow casting is two-sided: back faces flip instead of culling
    if geom.shadow_faces is not None:
        sfaces, sfv = geom.shadow_faces, geom.shadow_face_valid
    else:
        sfaces, sfv = geom.faces, geom.face_valid
    pre = geom.shadow_corner_verts is not None
    src = geom.shadow_corner_verts if pre else geom.verts
    if pre:
        # trace-time invariant: the pre-expanded stream must cover THIS
        # face stream (a corner stream built over geom.faces while
        # shadow_faces is set would silently shadow the wrong triangles)
        assert src.shape[0] == 3 * sfaces.shape[0], \
            "shadow_corner_verts does not match the shadow face stream"
    clip = clip_transform(src, light_view, light_proj)
    sx, sy, z, iw = project_to_screen(clip, s, s)
    rec, ok = assemble_tri_records(sx, sy, z, iw, sfaces,
                                   sfv, two_sided=True, pre_expanded=pre)
    binned = bin_triangles(rec, ok, s, s)
    depth = rasterize_depth(rec, binned, s, s)
    d = jnp.where(jnp.isfinite(depth), depth * 0.5 + 0.5, 1.0)
    return jnp.stack([d, d * d], axis=-1)      # (S, S, 2)


def shadow_pass_all(opts: RenderOptions, geom: SceneGeometry, casc_views,
                    casc_projs):
    """All CASCADES_MAX cascades in ONE raster over a vertically stacked
    (C·S, S) atlas — one binning sort and one kernel launch instead of
    four (the reference's CONFIG_SHADOW_MAP_ARRAY geometry-shader
    instancing plays the same trick, shadow.geom:5-27).

    Returns (CASCADES, S, S, 2) VSM moments."""
    s = opts.shadow_size * max(opts.shadow_msaa, 1)
    n_casc = casc_views.shape[0]
    # pad faces to a cluster multiple FIRST so per-cascade blocks stay
    # cluster-aligned in the concatenated stream (clusters must not
    # straddle cascade bands)
    from .raster import CLUSTER, rasterize_depth, tile_dims

    if geom.shadow_faces is not None:
        faces0, valid0 = geom.shadow_faces, geom.shadow_face_valid
    else:
        faces0, valid0 = geom.faces, geom.face_valid
    pre = geom.shadow_corner_verts is not None
    pad = (-faces0.shape[0]) % CLUSTER
    if pad:
        faces0 = jnp.concatenate(
            [faces0, jnp.zeros((pad, 3), faces0.dtype)])
        valid0 = jnp.concatenate([valid0, jnp.zeros((pad,), bool)])
    if pre:
        # corner stream (record order) instead of vertex table: the
        # per-cascade transform runs on 3T rows and the record build
        # needs no gather. Pad rows are masked by valid0's pad-False
        # entries — NOT by w (clip_transform appends homogeneous w=1,
        # so zero pad vertices project to the origin with nonzero w;
        # the valid mask is the only thing keeping them out).
        src = geom.shadow_corner_verts
        assert src.shape[0] == 3 * (faces0.shape[0] - pad), \
            "shadow_corner_verts does not match the shadow face stream"
        if pad:
            src = jnp.concatenate(
                [src, jnp.zeros((3 * pad, 3), src.dtype)])
    else:
        src = geom.verts
    sxs, sys_, zs, iws = [], [], [], []
    for c in range(n_casc):
        clip = clip_transform(src, casc_views[c], casc_projs[c])
        sx, sy, z, iw = project_to_screen(clip, s, s)
        sxs.append(sx)
        sys_.append(sy + c * s)       # atlas band offset
        zs.append(z)
        iws.append(iw)
    sx = jnp.concatenate(sxs)
    sy = jnp.concatenate(sys_)
    z = jnp.concatenate(zs)
    iw = jnp.concatenate(iws)
    V = geom.verts.shape[0]
    faces = None if pre else \
        jnp.concatenate([faces0 + c * V for c in range(n_casc)])
    valid = jnp.concatenate([valid0] * n_casc)
    rec, ok = assemble_tri_records(sx, sy, z, iw, faces, valid,
                                   two_sided=True, pre_expanded=pre)
    th, tw = tile_dims(s, n_casc * s)
    T = faces0.shape[0]
    band = jnp.repeat(jnp.arange(n_casc, dtype=jnp.int32), T)
    binned = bin_triangles(rec, ok, s, n_casc * s,
                           band_id=band, band_tiles=s // th,
                           tile_h=th, tile_w=tw)
    depth = rasterize_depth(rec, binned, s, n_casc * s, th, tw)
    d = jnp.where(jnp.isfinite(depth), depth * 0.5 + 0.5, 1.0)
    m = jnp.stack([d, d * d], axis=-1).reshape(n_casc, s, s, 2)
    if opts.shadow_msaa > 1:
        # multisample resolve: VSM moments are linear in coverage, so
        # the average pool IS the resolve (pipeline-builder.c:245-308)
        m = jax.vmap(lambda mm: post.downsample_pool(
            mm, opts.shadow_msaa))(m)
    return m


def _surface_kernel_attrs(opts: RenderOptions, geom: SceneGeometry, clip):
    """Kernel-side attribute interpolation (opts.kernel_attrs): the
    raster kernel's generic d0/d1/s plane slots interpolate the MODEL-
    LOCAL normal (records_to_coeffs extras layout — perspective-correct
    after the per-pixel normalize) and the entity id rides PACKED into
    the float tid column, so the per-pixel attr-table gather — the
    dominant HBM term of the composed frame (~30 ms/frame-batch at 64
    envs, the ~2k env-fps floor of gather-based deferred shading) —
    disappears entirely. All non-normal attributes are per-entity flat
    (geom.ent_flat) and come from ONE one-hot MXU lookup shared with
    the entity rotation.

    Eligibility is STATIC (raises otherwise): local-attrs geometry,
    untextured/un-fBm'd, E <= ENT_PACK entities, 2T·ENT_PACK < 2^24
    records (float tid exactness)."""
    from .raster import clip_near_records, ent_pack_stride, rasterize_attrs

    W, H = opts.width, opts.height
    if geom.ent_rot is None or geom.ent_flat is None \
            or (geom.face_entity is None and geom.comp is None):
        raise ValueError("kernel_attrs needs local-attrs geometry with "
                         "ent_flat (RenderTables.flat_eligible)")
    n_ent = geom.ent_rot.shape[-3]
    T = geom.comp.shape[-1] if geom.comp is not None else \
        geom.faces.shape[0]
    stride = ent_pack_stride(n_ent)     # adaptive: few entities → small
    if 2 * T * stride >= 1 << 24:       # stride → higher triangle cap
        raise ValueError(
            f"kernel_attrs limit exceeded: T={T} with E={n_ent} "
            f"(stride {stride}) needs 2·T·stride < 2^24")
    if geom.comp is not None:
        # cluster-record mode: per-corner clip components arrive fully
        # built (assemble_cluster_records_batch) — no gathers at all
        comps = [[geom.comp[c * 7 + i] for i in range(7)]
                 for c in range(3)]
        rec, ok, _csrc, _ = clip_near_records(
            None, None, W, H, geom.comp_valid,
            tid_pack=geom.comp_ent, pack_stride=stride,
            components=comps)
    else:
        pre = geom.corner_verts is not None
        vex = geom.normals
        if pre:
            if geom.corner_normals is None:
                raise ValueError("corner_verts without corner_normals: "
                                 "kernel_attrs interpolates normals")
            assert geom.corner_verts.shape[0] == 3 * geom.faces.shape[0], \
                "corner_verts does not match the face stream"
            vex = geom.corner_normals
        faces, fvalid, fent = geom.faces, geom.face_valid, geom.face_entity
        if opts.record_compact and not pre:
            from .raster import compact_faces

            faces, fvalid, fent = compact_faces(
                faces, fvalid, opts.record_compact,
                extra=fent.astype(jnp.int32))
        rec, ok, _csrc, _ = clip_near_records(
            clip, faces, W, H, fvalid,
            vextra=vex, tid_pack=fent,
            pack_stride=stride, pre_expanded=pre)
    binned = bin_triangles(rec, ok, W, H, cap=opts.raster_cap or None)
    depth, pid, nraw = rasterize_attrs(rec, binned, W, H)
    gb = GBuffer(depth=depth, tri_id=pid,
                 bary=jnp.zeros(pid.shape + (2,), jnp.float32))
    hit_px = pid >= 0
    # background (-1) maps to the out-of-range id → no one-hot match
    ent = jnp.where(hit_px, jnp.mod(pid, stride), n_ent)
    oh_px = (ent[..., None] == jnp.arange(n_ent)[None, None, :]
             ).astype(jnp.float32)
    tbl = jnp.concatenate(
        [geom.ent_rot.reshape(n_ent, 9), geom.ent_flat], axis=-1)
    px = jnp.einsum("hwe,ec->hwc", oh_px, tbl,
                    precision=jax.lax.Precision.HIGHEST)
    Rpx = px[..., :9].reshape(*ent.shape, 3, 3)
    # nraw = iw_px · (perspective-correct model-local normal); rotation
    # preserves scale, so normalize recovers the exact unit normal
    nrm = jnp.einsum("...ij,...j->...i", Rpx, nraw)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    base = px[..., 9:12]
    rough = px[..., 12]
    metal = px[..., 13]
    emission = px[..., 14:17]
    eid_px = px[..., 17] if geom.edge_id is not None else None
    return gb, nrm, base, rough, metal, emission, eid_px


def _surface_gather(opts: RenderOptions, geom: SceneGeometry, clip,
                    base_texture=None, textures=None):
    """Deferred-shading surface attributes via the per-pixel attr-table
    gather (the general path: per-vertex materials, textures, fBm)."""
    W, H = opts.width, opts.height
    # near-plane clipping (GL hardware-clip parity): camera-crossing
    # triangles raster as clipped sub-tris instead of dropping
    from .raster import clip_near_records

    pre = geom.corner_verts is not None
    if pre:
        assert geom.corner_verts.shape[0] == 3 * geom.faces.shape[0], \
            "corner_verts does not match the face stream"
    faces, fvalid = geom.faces, geom.face_valid
    face_entity = geom.face_entity
    if opts.record_compact and not pre:
        from .raster import compact_faces

        faces, fvalid, face_entity = compact_faces(
            faces, fvalid, opts.record_compact, extra=face_entity)
    rec, ok, csrc, cbary = clip_near_records(
        clip, faces, W, H, fvalid, pre_expanded=pre)
    binned = bin_triangles(rec, ok, W, H,
                           cap=opts.raster_cap or None)
    gb = rasterize(rec, binned, W, H)

    # dynamic attribute layout: optional streams (uv, tangents, texture
    # layer, local pos, material-fBm params) pack behind the core 11 —
    # world position is NOT interpolated: it reconstructs from the depth
    # buffer (the reference's view-pos-from-depth trick, ssao.frag:17-30),
    # trimming 3 columns off every per-pixel attr-gather row
    streams = [geom.normals, geom.base_color, geom.rough_metal,
               geom.emission]
    off = {"core": 0}
    cursor = 11
    textured = geom.uv is not None and (
        base_texture is not None or textures is not None)
    if textured:
        off["uv"] = cursor
        streams.append(geom.uv)
        cursor += 2
    tbn = (textures is not None and textures.normal is not None
           and geom.tangent is not None)
    if tbn:
        off["tangent"] = cursor
        streams.append(geom.tangent)
        cursor += 4
    if textures is not None and geom.tex_id is not None:
        off["tex_id"] = cursor
        streams.append(geom.tex_id[:, None].astype(jnp.float32))
        cursor += 1
    fbm_on = geom.mat_fbm is not None and geom.local_pos is not None
    if fbm_on:
        off["local"] = cursor
        streams.append(geom.local_pos)
        cursor += 3
        off["fbm"] = cursor
        streams.append(geom.mat_fbm)
        cursor += 6
    if geom.edge_id is not None:
        off["edge"] = cursor
        streams.append(geom.edge_id[:, None])
        cursor += 1
    vattrs = jnp.concatenate(streams, axis=-1)
    local_mode = geom.ent_rot is not None and geom.face_entity is not None
    tdt = jnp.bfloat16 if opts.attr_bf16 else None
    if local_mode:
        # per-face entity id rides the attr gather as a flat column
        # (a separate face_entity image gather cost ~4 ms @ 16 envs)
        attrs, flat_px = shade.interpolate_attrs(
            gb, faces, vattrs, csrc, cbary,
            face_attrs=face_entity[:, None].astype(jnp.float32),
            table_dtype=tdt)
    else:
        attrs = shade.interpolate_attrs(gb, faces, vattrs, csrc,
                                        cbary, table_dtype=tdt)

    # local-attrs mode: per-pixel entity rotation (one-hot MXU lookup —
    # exact selection under HIGHEST; a gather from a per-env (E, 9)
    # table would be a batched-operand gather under vmap)
    Rpx = None
    if local_mode:
        n_ent = geom.ent_rot.shape[0]
        # float-exact below 2^24; background pixels carry -1 → no match
        # → zero rotation, masked by the hit test downstream anyway
        fe = flat_px[..., 0].astype(jnp.int32)               # (H, W)
        oh_px = (fe[..., None] == jnp.arange(n_ent)[None, None, :]
                 ).astype(jnp.float32)
        Rpx = jnp.einsum(
            "hwe,ec->hwc", oh_px, geom.ent_rot.reshape(n_ent, 9),
            precision=jax.lax.Precision.HIGHEST).reshape(*fe.shape, 3, 3)
    nrm = attrs[..., 0:3]
    if Rpx is not None:
        nrm = jnp.einsum("...ij,...j->...i", Rpx, nrm)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    base = attrs[..., 3:6]
    rough = attrs[..., 6]
    metal = attrs[..., 7]
    emission = attrs[..., 8:11]

    if textured:
        uv_px = attrs[..., off["uv"]:off["uv"] + 2]
        if textures is not None:
            from .texture import sample_layered

            lid = attrs[..., off["tex_id"]].astype(jnp.int32) \
                if "tex_id" in off else jnp.zeros(gb.tri_id.shape, jnp.int32)
            has_tex = (attrs[..., off["tex_id"]] >= -0.5) \
                if "tex_id" in off else jnp.ones(gb.tri_id.shape, bool)
            texel = sample_layered(textures.diffuse, lid, uv_px)
            if textures.slope_blend is not None:
                # slope-based grass/rock atlas blend (terrain.frag:39-46)
                # using the GEOMETRIC normal (the reference terrain path
                # has no normal map; nrm is pre-mapping here)
                uv_q = jnp.mod(uv_px, 0.5)
                grass = sample_layered(textures.diffuse, lid, uv_q)
                rock = sample_layered(textures.diffuse, lid, uv_q + 0.5)
                fac = jnp.clip(nrm[..., 1], 0.0, 1.0)[..., None] ** 4
                sb = textures.slope_blend[
                    jnp.clip(lid, 0, textures.slope_blend.shape[0] - 1)]
                texel = jnp.where(sb[..., None],
                                  grass * fac + rock * (1.0 - fac), texel)
            base = jnp.where(has_tex[..., None], base * texel, base)
            if tbn:
                # TBN normal mapping (model.vert:54-67 + lighting.glsl:174)
                t4 = attrs[..., off["tangent"]:off["tangent"] + 4]
                t = t4[..., :3]
                if Rpx is not None:   # local-attrs: rotate tangent too
                    t = jnp.einsum("...ij,...j->...i", Rpx, t)
                t = t - jnp.sum(t * nrm, -1, keepdims=True) * nrm
                t = t / jnp.maximum(
                    jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
                b = jnp.cross(nrm, t) * t4[..., 3:4]
                nm = sample_layered(textures.normal, lid, uv_px) * 2.0 - 1.0
                mapped = (t * nm[..., 0:1] + b * nm[..., 1:2]
                          + nrm * nm[..., 2:3])
                mapped = mapped / jnp.maximum(
                    jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-6)
                nrm = jnp.where(has_tex[..., None], mapped, nrm)
            if textures.emission is not None:
                em_tex = sample_layered(textures.emission, lid, uv_px)
                emission = jnp.where(has_tex[..., None],
                                     emission + em_tex, emission)
        elif base_texture is not None:
            from .texture import sample_bilinear

            texel = sample_bilinear(base_texture, uv_px)
            base = base * texel[..., :3]   # modulate (model.frag diffuse)

    if fbm_on:
        # procedural roughness/metallic fBm of LOCAL-space position
        # (lighting.glsl:20-50; material_fbm was unrouted in r1)
        lp = attrs[..., off["local"]:off["local"] + 3]
        fp = attrs[..., off["fbm"]:off["fbm"] + 6]
        f = shade.material_fbm(lp, fp[..., 0], 4, fp[..., 1:2])
        use = fp[..., 0] > 0
        rough = jnp.where(use, fp[..., 2] + (fp[..., 3] - fp[..., 2]) * f,
                          rough)
        metal = jnp.where(use, fp[..., 4] + (fp[..., 5] - fp[..., 4]) * f,
                          metal)

    eid_px = attrs[..., off["edge"]] if "edge" in off else None
    return gb, nrm, base, rough, metal, emission, eid_px


def model_pass(opts: RenderOptions, geom: SceneGeometry, cam_view, cam_proj,
               lights: Lights, eye, shadow_moments=None, shadow_mvps=None,
               cascade_dists=None, base_texture=None, textures=None,
               static_shadow=None):
    """MRT model pass (pipeline-builder.c:329-364) as raster + deferred
    shading. Returns (hdr lighting, emission, view normals, gbuffer,
    view_pos, edge_meta).

    static_shadow: optional (moments, mvps, dists) baked static-caster
    atlas (scenerender.bake_static_shadow) — its factor multiplies the
    per-frame CSM factor, which then only needs the dynamic-caster
    stream."""
    W, H = opts.width, opts.height
    # corner-expanded static stream: transform 3T corner rows directly
    # (clip_near_records then skips its per-frame corner gather)
    if geom.corner_verts is not None:
        # a corner stream built over a DIFFERENT face table would
        # silently render the wrong triangles
        assert geom.corner_verts.shape[0] == 3 * geom.faces.shape[0], \
            "corner_verts does not match the face stream"
    if geom.comp is not None:
        # cluster-record mode: clip components arrive pre-built
        clip = None
        if not opts.kernel_attrs:
            raise ValueError("cluster-record geometry (comp) requires "
                             "opts.kernel_attrs")
    else:
        clip = clip_transform(
            geom.corner_verts if geom.corner_verts is not None
            else geom.verts, cam_view, cam_proj)
    if opts.kernel_attrs:
        gb, nrm, base, rough, metal, emission, eid_px = \
            _surface_kernel_attrs(opts, geom, clip)
    else:
        gb, nrm, base, rough, metal, emission, eid_px = \
            _surface_gather(opts, geom, clip, base_texture, textures)

    # world position from depth (inverse view-projection unproject)
    hit2 = gb.tri_id >= 0
    d_ndc = jnp.where(jnp.isfinite(gb.depth), gb.depth, 1.0)
    ndc_x = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W * 2.0 - 1.0
    ndc_y = 1.0 - 2.0 * (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H
    inv_vp = jnp.linalg.inv(cam_proj @ cam_view)
    p4 = (inv_vp[None, None, :, 0] * jnp.broadcast_to(ndc_x, (H, W))[..., None]
          + inv_vp[None, None, :, 1] * jnp.broadcast_to(ndc_y, (H, W))[..., None]
          + inv_vp[None, None, :, 2] * d_ndc[..., None]
          + inv_vp[None, None, :, 3])
    wpos = jnp.where(hit2[..., None],
                     p4[..., :3] / jnp.where(jnp.abs(p4[..., 3:4]) < 1e-12,
                                             1.0, p4[..., 3:4]), 0.0)

    # view-space data
    vpos = mx.mat4_transform_point(cam_view, wpos)
    vnrm = mx.mat4_transform_dir(cam_view, nrm)
    view_depth = -vpos[..., 2]

    sf = None
    q_pos = q_vd = None
    if shadow_moments is not None or static_shadow is not None:
        # shadow factors at QUARTER res: VSM is already a filtered
        # estimator, so the factor field is smooth — 1/16th the
        # projection + atlas-fetch cost, bilinear upsample back
        q_pos = post.downsample_pool(wpos, 4)
        q_vd = post.downsample_pool(view_depth, 4)

    def _up(sf_q):
        sf_h = post.upsample2(sf_q[..., None],
                              sf_q.shape[0] * 2, sf_q.shape[1] * 2)
        return post.upsample2(sf_h, H, W)[..., 0]

    if shadow_moments is not None:
        if opts.shadow_vsm:
            sf = _up(shade.vsm_shadow(shadow_moments, shadow_mvps,
                                      cascade_dists, q_pos, q_vd))
        else:
            # PCF 5×5 on the depth channel (shadow.glsl non-VSM path)
            sf = shade.pcf_shadow(shadow_moments[..., 0], shadow_mvps,
                                  cascade_dists, wpos, view_depth, nrm,
                                  lights.direction[0])
    if static_shadow is not None:
        # static-caster bounds atlas (scenerender.bake_static_shadow):
        # factors MULTIPLY — exact unless a static and a dynamic
        # occluder overlap along the same light ray (then shadow is
        # darkest-of-two either way)
        sm_s, mvp_s, cd_s = static_shadow
        sf_s = _up(shade.vsm_shadow(sm_s, mvp_s, cd_s, q_pos, q_vd))
        sf = sf_s if sf is None else sf * sf_s
    if sf is not None:
        # grazing fade (shadow.glsl:202): mix(sf, 1, (1-NdotL)^1.3)
        l0 = -lights.direction[0]
        ndl = jnp.clip(jnp.sum(nrm * l0[None, None], -1), 0.0, 1.0)
        sf = sf + (1.0 - sf) * jnp.power(1.0 - ndl, 1.3)

    tile_mask = light_grid(lights, cam_view, cam_proj, W, H)
    mat = shade.Material(base_color=base, roughness=rough, metallic=metal,
                         emission=emission)
    fog_density = None
    if opts.material_fog:
        # use_3d_fog (lighting.glsl:209-213): per-pixel density from the
        # fBm gradient field at the WORLD position, evaluated
        # analytically (no 3D-texture gathers — ops/noise.py)
        from ..ops.noise import fog_cloud

        fog_density = fog_cloud(wpos, opts.fog_3d_amp, opts.fog_3d_scale)
    hdr = shade.shade_pixels(wpos, nrm, eye, mat, lights, tile_mask,
                             shadow_factor=sf, fog_density=fog_density)
    hit = (gb.tri_id >= 0)[..., None]
    hdr = jnp.where(hit, hdr, jnp.array(opts.fog_color)[None, None])
    emit = post.bloom_threshold(emission, opts.bloom_threshold,
                                opts.bloom_intensity)

    # edge-mode metadata (RT2 alpha packing, model.frag:109-125 +
    # shader_constants.h:57-63): per-pixel key = solid-id bits + 3-bit
    # quantized luma, with the luma bits FLIPPED inside shadow so shadow
    # boundaries outline; bit7 = outline-exclude. The sobel edge pass
    # differentiates this key instead of raw luma, so id boundaries
    # always edge and excluded entities never do.
    edge_meta = None
    if eid_px is not None:
        excl = eid_px >= 128.0
        sid = jnp.mod(eid_px, 128.0)
        luma = jnp.sum(vnrm * 0.5 + 0.5, -1) / 3.0
        lq = jnp.floor(jnp.clip(luma, 0.0, 1.0) * 7.0)
        if sf is not None:
            lq = jnp.where(sf < opts.shadow_outline_threshold, 7.0 - lq,
                           lq)
        key = sid * 8.0 + lq
        edge_meta = (jnp.where(gb.tri_id >= 0, key, -8.0), excl)
    return hdr, emit, vnrm, gb, vpos, edge_meta


def particle_pass(opts: RenderOptions, hdr, scene_depth, ppos, psize,
                  pactive, cam_view, cam_proj, color=(0.9, 0.9, 0.6),
                  alpha: float = 0.55):
    """Rasterize particle billboards and alpha-blend them over the HDR
    buffer (particle.c:122-125 draws instanced quads with blending; here
    the nearest particle per pixel wins the blend — a single
    transparency layer, which matches the visual density of the
    reference's small additive-ish sprites).

    ppos: (P, 3) world positions; psize: scalar or (P,); pactive: (P,).
    """
    from ..ops.particles import particle_clip_quads
    from .raster import (bin_triangles, corner_records, project_to_screen,
                         rasterize)

    W, H = opts.width, opts.height
    verts, faces, valid, _owner = particle_clip_quads(
        ppos, psize, cam_view, cam_proj, pactive)
    sx, sy, z, iw = project_to_screen(verts, W, H)
    vr = jnp.stack([sx, sy, z, iw], axis=-1).reshape(-1, 3, 4)
    rec, ok = corner_records(vr[:, 0], vr[:, 1], vr[:, 2], valid)
    gb = rasterize(rec, bin_triangles(rec, ok, W, H), W, H)
    # depth test against the opaque scene, then blend
    vis = (gb.tri_id >= 0) & (gb.depth < scene_depth)
    c = jnp.asarray(color, hdr.dtype)
    return jnp.where(vis[..., None],
                     hdr * (1.0 - alpha) + c[None, None] * alpha, hdr)


def render_frame(opts: RenderOptions, geom: SceneGeometry, cam_view,
                 cam_proj, lights: Lights, eye, far: float = 200.0,
                 ssao_kernel_arr=None, grain_noise=None, lut_volume=None,
                 base_texture=None, shadow_moments=None, shadow_mvps=None,
                 cascade_dists=None, particles=None, textures=None,
                 static_shadow=None, _taps=None):
    """The full canonical frame (pipeline_build chain). Returns the
    final LDR (or PQ) image (H, W, 3).

    shadow_moments/shadow_mvps/cascade_dists: optionally precomputed
    (e.g. a shared atlas for a multi-view batch, render_frame_batch);
    None → per-view CSM fit + shadow passes, like the reference.

    _taps: internal — a dict the per-pass browser fills with each
    pass's intermediate image (render_frame_debug); None costs
    nothing."""
    if opts.internal_scale > 1:
        # shading-rate lever: the whole 3D frame renders at 1/s² the
        # pixels; only the final LDR upscale touches full resolution
        import dataclasses

        s = opts.internal_scale
        iopts = dataclasses.replace(opts, width=max(opts.width // s, 8),
                                    height=max(opts.height // s, 8),
                                    internal_scale=1)
        img = render_frame(iopts, geom, cam_view, cam_proj, lights, eye,
                           far=far, ssao_kernel_arr=ssao_kernel_arr,
                           grain_noise=grain_noise, lut_volume=lut_volume,
                           base_texture=base_texture,
                           shadow_moments=shadow_moments,
                           shadow_mvps=shadow_mvps,
                           cascade_dists=cascade_dists,
                           particles=particles, textures=textures,
                           static_shadow=static_shadow, _taps=_taps)
        return post.upsample_bilinear(img, opts.height, opts.width)
    if opts.model_msaa > 1:
        # supersample resolve: render f× pixels, box-filter down (the
        # MSAA analogue — every covered sample is shaded, so this is
        # SSAA-quality at MSAA's API surface)
        import dataclasses

        f = opts.model_msaa
        sopts = dataclasses.replace(opts, width=opts.width * f,
                                    height=opts.height * f, model_msaa=1)
        img = render_frame(sopts, geom, cam_view, cam_proj, lights, eye,
                           far=far, ssao_kernel_arr=ssao_kernel_arr,
                           grain_noise=grain_noise, lut_volume=lut_volume,
                           base_texture=base_texture,
                           shadow_moments=shadow_moments,
                           shadow_mvps=shadow_mvps,
                           cascade_dists=cascade_dists,
                           particles=particles, textures=textures,
                           static_shadow=static_shadow, _taps=_taps)
        return post.downsample_pool(img, f)
    W, H = opts.width, opts.height

    # fully static scene under the shadow split: the dynamic caster
    # stream is statically empty — skip the per-view CSM fit entirely
    # (the record pipeline can't run on a 0-length stream, and the
    # baked static atlas already carries every shadow)
    casters = geom.shadow_faces if geom.shadow_faces is not None \
        else geom.faces
    if shadow_moments is None and casters.shape[0] > 0 \
            and lights.active.shape[0] > 0:
        ldir = lights.direction[0]
        casc, cascade_dists = cascade_subviews(cam_view, cam_proj, ldir,
                                               0.1, far)
        shadow_moments = shadow_pass_all(opts, geom, casc.view, casc.proj)
        shadow_mvps = jnp.einsum("cij,cjk->cik", casc.proj, casc.view)

    hdr, emit, vnrm, gb, vpos, edge_meta = model_pass(
        opts, geom, cam_view, cam_proj, lights, eye,
        shadow_moments, shadow_mvps, cascade_dists, base_texture,
        textures, static_shadow=static_shadow,
    )
    if _taps is not None:
        # the model pass's MRT outputs + the shadow pass it consumed
        # (pipeline-debug.c previews each pass's FBO attachments)
        if shadow_moments is not None:
            _taps["shadow_atlas"] = shadow_moments[..., 0]
        _taps["lighting_hdr"] = hdr
        _taps["emission"] = emit
        _taps["view_normals"] = vnrm * 0.5 + 0.5
        _taps["depth"] = gb.depth
        if edge_meta is not None:
            _taps["edge_key"] = edge_meta[0]

    if particles is not None:
        # particles: (ppos (P,3), psize, pactive[, color[, alpha]])
        ppos, psize, pactive = particles[:3]
        pkw = {}
        if len(particles) > 3:
            pkw["color"] = particles[3]
        if len(particles) > 4:
            pkw["alpha"] = particles[4]
        hdr = particle_pass(opts, hdr, gb.depth, ppos, psize, pactive,
                            cam_view=cam_view, cam_proj=cam_proj, **pkw)

    # edges (sobel on the packed edge-mode key | laplace on depth) —
    # computed on gbuffer data before any color-space work
    if opts.edge_sobel and edge_meta is not None:
        key, excl = edge_meta
        edges = post.sobel_edges(key / 8.0)
        # outline-exclude: suppress edges touching an excluded pixel
        # (bit7 semantics; 4-neighbour dilation of the exclusion mask)
        ex = excl
        for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
            ex = ex | jnp.roll(excl, sh, axis=ax)
        edges = jnp.where(ex, 0.0, edges)
    elif opts.edge_sobel:
        luma = jnp.sum(vnrm * 0.5 + 0.5, -1) / 3.0
        edges = post.sobel_edges(luma)
    else:
        d = jnp.where(jnp.isfinite(gb.depth), gb.depth, 1.0)
        edges = post.laplace_edges(d)
    edge_mask = jnp.clip(edges * 2.0, 0.0, 1.0)

    if _taps is not None:
        _taps["edges"] = edge_mask
    smaa_weights = None
    if opts.edge_aa:
        smaa_weights = post.smaa_blend_weights(edge_mask)
        hdr = post.smaa_neighborhood_blend(hdr, smaa_weights)
        if _taps is not None:
            _taps["smaa_weights"] = smaa_weights

    if opts.ssao:
        # ¼-res inputs via average pooling (::4 strided decimation pays
        # a lane-stride relayout; pooling also denoises the AO inputs)
        q_pos = post.downsample_pool(vpos, 4)
        q_nrm = post.downsample_pool(vnrm, 4)
        q_nrm = q_nrm / jnp.maximum(
            jnp.linalg.norm(q_nrm, axis=-1, keepdims=True), 1e-6)
        if opts.ssao_mode == "shift":
            ao_raw = post.ssao_shift(q_pos, q_nrm)
        else:
            import jax as _jax

            kern = ssao_kernel_arr if ssao_kernel_arr is not None else \
                post.ssao_kernel(_jax.random.PRNGKey(7))
            ao_raw = post.ssao(q_pos, q_nrm, kern)
        ao_q = post.ssao_blur(ao_raw)
        ao = post.upsample2(post.upsample2(
            ao_q, ao_q.shape[0] * 2, ao_q.shape[1] * 2), H, W)
        if _taps is not None:
            _taps["ssao"] = ao
        hdr = hdr * (0.4 + 0.6 * ao[..., None])

    # combine-pass ordering matches combine.frag:65-117: SMAA/SSAO (above)
    # → HDR assembly `lit·exposure + bloom·(1-fog)` → fog → contrast →
    # LUT → tonemap → edges (faded by fog + SMAA weights) → grain → OETF
    view_dist = jnp.linalg.norm(vpos, axis=-1)
    view_dist = jnp.where(gb.tri_id >= 0, view_dist, 1e9)
    fog_f = jnp.clip((view_dist - opts.fog_near)
                     / max(opts.fog_far - opts.fog_near, 1e-6), 0.0, 1.0)

    color = hdr * opts.lighting_exposure
    if opts.bloom:
        # ¼-res blur of the thresholded emission, re-added in HDR and
        # faded out by fog (pipeline-builder.c:366-411; combine.frag:82-87)
        bloom = post.upsample2(
            post.gauss_blur_v(post.gauss_blur_h(
                post.downsample2(post.downsample2(emit)))), H, W)
        if _taps is not None:
            _taps["bloom"] = bloom
        color = color + bloom * (opts.bloom_intensity
                                 * (1.0 - fog_f))[..., None]
    fc = jnp.array(opts.fog_color, color.dtype)[None, None]
    if opts.fog_noise:
        # radial_fog_color (combine.frag:43-48): the fog tint darkens by
        # the squared magnitude of a jittered noise3d sample at the VIEW
        # position — analytic field, no volume gathers
        from ..ops.noise import noise3d_field, noise_glsl

        nv = noise3d_field(vpos + noise_glsl(vpos)[..., None],
                           0.05) * 0.05
        nfac = jnp.minimum(jnp.sum(nv * nv, -1), 3.0) / 3.0
        fc = fc * (1.0 - nfac[..., None])
    color = color * (1.0 - fog_f[..., None]) + fc * fog_f[..., None]
    color = post.contrast(color, opts.contrast)
    if opts.lighting_lut and lut_volume is not None:
        from .lut import apply_lut

        color = apply_lut(color, lut_volume)
    color = shade.tonemap_aces(color) if opts.tonemap_aces else \
        shade.tonemap_reinhard(color)
    if opts.outline_strength > 0:
        # cartoon outlines composited post-tonemap, faded by fog and by
        # SMAA blend weights so anti-aliased edges don't double-darken
        # (combine.frag:94-117)
        fade = 1.0 - fog_f
        if smaa_weights is not None:
            fade = fade * (1.0 - 0.5 * jnp.sum(smaa_weights, -1))
        color = color * (1.0 - opts.outline_strength * edge_mask
                         * fade)[..., None]
    if opts.film_grain > 0 and grain_noise is not None:
        color = post.film_grain(color, grain_noise, opts.film_grain)
    out = shade.oetf_pq(color) if opts.hdr else shade.oetf_srgb(color)
    if _taps is not None:
        _taps["combine"] = out
    return out


def render_frame_batch(opts: RenderOptions, geom: SceneGeometry, cam_views,
                       cam_proj, lights: Lights, eyes, far: float = 200.0,
                       shared_shadow: bool = True, scene_aabb=None, **kw):
    """Render B views of ONE shared scene (batched 256² configuration).

    shared_shadow=True renders a single stable light atlas fitted to the
    scene bounds instead of B×4 per-view cascades — valid whenever the
    geometry and lights are shared across the batch (per-env dynamic
    geometry must use shared_shadow=False, which falls back to per-view
    CSM exactly like render_frame). cam_views: (B, 4, 4); eyes: (B, 3).
    """
    from .view import bounds_light_subview

    sm = mv = cd = None
    if shared_shadow and lights.active.shape[0] > 0:
        if scene_aabb is None:
            scene_aabb = (geom.verts.min(axis=0) - 1.0,
                          geom.verts.max(axis=0) + 1.0)
        sv, cd = bounds_light_subview(scene_aabb[0], scene_aabb[1],
                                      lights.direction[0], far=far)
        sm = shadow_pass_all(opts, geom, sv.view, sv.proj)
        mv = jnp.einsum("cij,cjk->cik", sv.proj, sv.view)

    def one(vw, e):
        return render_frame(opts, geom, vw, cam_proj, lights, e, far=far,
                            shadow_moments=sm, shadow_mvps=mv,
                            cascade_dists=cd, **kw)

    return jax.vmap(one)(cam_views, eyes)


def render_frame_dynamic_batch(opts: RenderOptions, geom, geom_axes,
                               cam_views, cam_proj, lights: Lights, eyes,
                               far: float = 200.0, **kw):
    """Render B envs with PER-ENV dynamic geometry — the honest
    north-star composition (step+render over per-env scenes).

    geom/geom_axes come from scenerender.assemble_scene_geometry_batch:
    per-env verts/face_valid/ent_rot are vmapped, every attribute table
    stays shared, and each env fits + renders its own CSM shadow atlas
    (shared_shadow is impossible when geometry differs per env).
    cam_views: (B, 4, 4); eyes: (B, 3)."""

    def one(g, vw, e):
        return render_frame(opts, g, vw, cam_proj, lights, e, far=far,
                            **kw)

    return jax.vmap(one, in_axes=(geom_axes, 0, 0))(geom, cam_views, eyes)


def menu_blur(frame, opts: RenderOptions):
    """Pause-menu blur checkpoint (reference pipeline-builder.c:570-610,
    checkpoint mechanism pipeline.c:530-567): when the game pauses, the
    frame graph stops at a ¼-res downsample → gaussian blur → contrast
    pass and presents THAT instead of the combine output, giving a
    blurred backdrop for the menu UI.

    Takes the finished LDR frame (H, W, 3) and returns the blurred
    backdrop at the same size.
    """
    h, w = frame.shape[0], frame.shape[1]
    q = post.downsample2(post.downsample2(frame))
    q = post.gauss_blur_v(post.gauss_blur_h(q))
    q = post.contrast(q, opts.contrast + 0.1)
    return post.upsample2(post.upsample2(q, q.shape[0] * 2, q.shape[1] * 2),
                          h, w)
