"""Deferred shading: BRDF, materials, shadows, tonemap (reference:
shaders/lighting.glsl, shaders/shadow.glsl, shaders/tonemap.glsl,
shaders/oetf.glsl — formulas per SURVEY §8).

All functions are pure elementwise image math over (..., H, W[, C])
arrays — one fused XLA pass per shading stage. Attribute interpolation
gathers packed per-vertex records by the G-buffer's triangle id (the
same single-gather packing trick as the heightfield/skinning paths).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.gatherx import gather_rows
from .lights import LIGHT_TILE, Lights
from .raster import GBuffer


# ---------------------------------------------------------------------------
# G-buffer attribute interpolation
# ---------------------------------------------------------------------------

def pack_tri_attrs(faces, vattrs):
    """(T, 3A) per-triangle attribute records: the three corners'
    attributes concatenated. Built once per frame at triangle scale so
    the per-pixel stage needs ONE image-sized gather (gather op count at
    image scale dominates the shading cost on TPU)."""
    return jnp.concatenate(
        [vattrs[faces[:, 0]], vattrs[faces[:, 1]], vattrs[faces[:, 2]]],
        axis=-1)


def interpolate_attrs(gb: GBuffer, faces, vattrs, csrc=None, cbary=None,
                      face_attrs=None, table_dtype=None):
    """Per-pixel interpolated vertex attributes.

    faces: (T, 3) int32; vattrs: (V, A) packed per-vertex attributes.
    Returns (H, W, A); background pixels get zeros.

    csrc (near-plane clip, raster.clip_near_records): the G-buffer ids
    are SUB-triangle ids but gb.bary is ALREADY composed w.r.t. the
    original triangle (the coefficient fold in records_to_coeffs), so
    only the id needs mapping back — csrc = [0..T-1, 0..T-1] by
    construction, i.e. orig id = sub id mod T. The attribute table stays
    the view-invariant (T, 3A) one (a per-view table makes the image
    gather a batched-operand gather, ~5× slower at 64 views of a shared
    scene). cbary is accepted for API symmetry; the composition lives in
    the raster records.

    face_attrs (T, F), optional: flat per-FACE columns appended to the
    packed record so they ride the SAME per-pixel gather (a separate
    face_entity image gather cost ~4 ms/frame at 16 envs). When given,
    returns (attrs (H, W, A), flat (H, W, F)) — flat columns are copied
    from the record, not interpolated; background pixels get -1.

    table_dtype (e.g. jnp.bfloat16): storage dtype of the gathered
    record. TPU HBM stores the (B·H·W, 3A+F) gather output lane-padded
    to 128 columns whatever A is, so dtype is the ONLY lever on its
    bytes — bf16 halves the dominant HBM term of deferred shading.
    Interpolation upcasts back to vattrs.dtype. bf16's 8-bit mantissa
    is plenty for normals/colors/roughness, and integer-valued columns
    (edge ids ≤ 128, entity ids) stay EXACT below 256."""
    del cbary
    A = vattrs.shape[-1]
    tri_attrs = pack_tri_attrs(faces, vattrs)          # (T, 3A) shared
    if face_attrs is not None:
        tri_attrs = jnp.concatenate(
            [tri_attrs, face_attrs.astype(tri_attrs.dtype)], axis=-1)
    if table_dtype is not None:
        tri_attrs = tri_attrs.astype(table_dtype)
    b0 = gb.bary[..., 0:1]
    b1 = gb.bary[..., 1:2]
    tid = jnp.maximum(gb.tri_id, 0)
    if csrc is not None:
        tid = jnp.mod(tid, faces.shape[0])
    rec = tri_attrs[tid]                            # (H, W, 3A+F): 1 gather
    if table_dtype is not None:
        rec = rec.astype(vattrs.dtype)
    b2 = 1.0 - b0 - b1
    out = rec[..., :A] * b0 + rec[..., A:2 * A] * b1 \
        + rec[..., 2 * A:3 * A] * b2
    hit = (gb.tri_id >= 0)[..., None]
    out = jnp.where(hit, out, 0.0)
    if face_attrs is None:
        return out
    flat = jnp.where(hit, rec[..., 3 * A:], -1.0)
    return out, flat


def face_attr(gb: GBuffer, per_face):
    """Per-pixel flat (per-face) attribute gather, e.g. material id."""
    tid = jnp.maximum(gb.tri_id, 0)
    out = per_face[tid]
    fill = jnp.zeros_like(out)
    return jnp.where(
        (gb.tri_id >= 0).reshape(gb.tri_id.shape + (1,) * (out.ndim - 2)),
        out, fill,
    )


# ---------------------------------------------------------------------------
# Cook-Torrance GGX (lighting.glsl:94-139)
# ---------------------------------------------------------------------------

class Material(NamedTuple):
    base_color: jnp.ndarray   # (..., 3)
    roughness: jnp.ndarray    # (...)
    metallic: jnp.ndarray     # (...)
    emission: jnp.ndarray     # (..., 3)


def ggx_brdf(n, v, l, base_color, roughness, metallic):
    """Per-light Cook-Torrance term (lighting.glsl:94-139). Inputs are
    unit vectors (..., 3); returns (diffuse (...,3), specular (...,3))
    each already scaled by NdotL."""
    alpha = jnp.clip(roughness * roughness, 0.05, 0.98)
    h = v + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-6)
    ndl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, -1), 1e-4)
    ndh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    vdh = jnp.maximum(jnp.sum(v * h, -1), 0.0)

    a2 = alpha * alpha
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    D = a2 / jnp.maximum(jnp.pi * denom * denom, 1e-6)

    f0 = 0.04 * (1.0 - metallic[..., None]) + base_color * metallic[..., None]
    F = f0 + (1.0 - f0) * jnp.power(1.0 - vdh, 5.0)[..., None]

    k = (alpha + 1.0) ** 2 / 8.0
    g1 = ndl / jnp.maximum(ndl * (1 - k) + k, 1e-6)
    g2 = ndv / jnp.maximum(ndv * (1 - k) + k, 1e-6)
    G = g1 * g2

    spec = F * (D * G / jnp.maximum(4.0 * ndl * ndv, 1e-6))[..., None]
    kd = (1.0 - F) * (1.0 - metallic[..., None])
    diff = kd * base_color / jnp.pi
    return diff * ndl[..., None], spec * ndl[..., None]


def attenuation(att, dist):
    """1/(kc + kl·d + kq·d²) (lighting.glsl:98-99)."""
    return 1.0 / jnp.maximum(
        att[..., 0] + att[..., 1] * dist + att[..., 2] * dist * dist, 1e-6
    )


def spot_factor(l, light_dir, cutoff):
    """Spotlight smoothstep between cos(cutoff) and cos(cutoff+5°)
    (lighting.glsl:57-66). cutoff <= -1 → point light (factor 1)."""
    cd = jnp.sum(-l * light_dir, axis=-1)
    co = jnp.cos(jnp.arccos(jnp.clip(cutoff, -1.0, 1.0)) + jnp.deg2rad(5.0))
    t = jnp.clip((cd - co) / jnp.maximum(cutoff - co, 1e-6), 0.0, 1.0)
    f = t * t * (3.0 - 2.0 * t)
    return jnp.where(cutoff <= -1.0, 1.0, f)


def shade_pixels(world_pos, normal, view_pos, mat: Material, lights: Lights,
                 tile_mask, shadow_factor=None, ambient=0.1,
                 shadow_tint=None, fog_density=None):
    """Accumulate all lights for an image (H, W) (model.frag main loop,
    lighting.glsl:141-207).

    tile_mask: (nty, ntx, L) from light_grid; light 0 is the shadow
    caster (lighting.glsl:184-190): its diffuse is tinted and specular
    zeroed where shadowed.

    fog_density: optional (H, W) material-fog density (use_3d_fog,
    lighting.glsl:209-213): lit color blends toward the ambient fog
    color and specular attenuates by (1 − density) — the surface-local
    dusty/steamy look, not a depth-integrated fog."""
    H, W = world_pos.shape[:2]
    v = view_pos[None, None, :] - world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)

    # expand the tile grid by repeat (regular tiling → no gathers)
    up = jnp.repeat(jnp.repeat(tile_mask, LIGHT_TILE, axis=0),
                    LIGHT_TILE, axis=1)
    pix_mask = up[:H, :W]

    L = lights.pos.shape[0]
    total_d = jnp.zeros_like(mat.base_color)
    total_s = jnp.zeros_like(mat.base_color)
    if shadow_factor is None:
        shadow_factor = jnp.ones((H, W))
    if shadow_tint is None:
        shadow_tint = jnp.array([0.3, 0.3, 0.4])

    for li in range(L):  # static light capacity; masked per pixel
        to_l = jnp.where(lights.is_dir[li], -lights.direction[li][None, None],
                         lights.pos[li][None, None] - world_pos)
        dist = jnp.linalg.norm(to_l, axis=-1)
        l = to_l / jnp.maximum(dist[..., None], 1e-6)
        diff, spec = ggx_brdf(normal, v, l, mat.base_color,
                              mat.roughness, mat.metallic)
        att = jnp.where(lights.is_dir[li], 1.0,
                        attenuation(lights.attenuation[li], dist))
        att = att * spot_factor(l, lights.direction[li][None, None],
                                lights.cutoff[li])
        ca = lights.color[li][None, None] * att[..., None]
        d_li, s_li = diff * ca, spec * ca
        if li == 0:
            # shadow caster: mix diffuse toward tinted, kill spec in shadow
            sf = shadow_factor[..., None]
            d_li = d_li * sf + d_li * shadow_tint[None, None] * (1 - sf)
            s_li = s_li * sf
        m = pix_mask[..., li: li + 1]
        total_d = total_d + jnp.where(m, d_li, 0.0)
        total_s = total_s + jnp.where(m, s_li, 0.0)

    amb_tint = 1.0 * shadow_factor[..., None] \
        + shadow_tint[None, None] * (1 - shadow_factor[..., None])
    total_d = total_d + ambient * mat.base_color * amb_tint
    if fog_density is not None:
        # use_3d_fog (lighting.glsl:209-213): diffuse → ambient fog
        # color, specular × (1 − density)
        fd = fog_density[..., None]
        amb_col = jnp.full((3,), ambient, total_d.dtype)
        total_d = total_d * (1.0 - fd) + amb_col[None, None] * fd
        total_s = total_s * (1.0 - fd)
    return total_d + total_s


# ---------------------------------------------------------------------------
# material noise (lighting.glsl:20-50) — procedural roughness/metallic
# ---------------------------------------------------------------------------

def _hash3(p):
    q = jnp.sin(jnp.sum(p * jnp.array([127.1, 311.7, 74.7]), -1)) * 43758.5453
    return q - jnp.floor(q)


def value_noise3(p):
    """Cheap 3D value noise for material fBm (noise.glsl analogue)."""
    i = jnp.floor(p)
    f = p - i
    u = f * f * (3.0 - 2.0 * f)

    def corner(dx, dy, dz):
        return _hash3(i + jnp.array([dx, dy, dz], p.dtype))

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    x00 = c000 * (1 - u[..., 0]) + c100 * u[..., 0]
    x10 = c010 * (1 - u[..., 0]) + c110 * u[..., 0]
    x01 = c001 * (1 - u[..., 0]) + c101 * u[..., 0]
    x11 = c011 * (1 - u[..., 0]) + c111 * u[..., 0]
    y0 = x00 * (1 - u[..., 1]) + x10 * u[..., 1]
    y1 = x01 * (1 - u[..., 1]) + x11 * u[..., 1]
    return y0 * (1 - u[..., 2]) + y1 * u[..., 2]


def material_fbm(local_pos, amp, octaves: int, scale):
    """fBm of local-space position driving roughness/metallic
    (lighting.glsl:20-50): result lerps material floor→ceil."""
    total = jnp.zeros(local_pos.shape[:-1], local_pos.dtype)
    freq = 1.0
    a = amp
    for _ in range(octaves):
        total = total + a * value_noise3(local_pos * (scale * freq))
        freq *= 2.0
        a *= 0.5
    return jnp.clip(total, 0.0, 1.0)


# ---------------------------------------------------------------------------
# shadow estimators (shadow.glsl; SURVEY §8.4)
# ---------------------------------------------------------------------------

def select_cascade(view_depth, cascade_dists):
    """First cascade whose far distance exceeds the pixel's view depth
    (shadow.glsl:148-155)."""
    d = view_depth[..., None]
    past = d >= cascade_dists[None, None, :]
    return jnp.minimum(jnp.sum(past, -1), cascade_dists.shape[0] - 1)


def _bilinear(img, u, v):
    """Bilinear sample of (S, S[, C]) image at pixel coords (u, v)."""
    s = img.shape[0]
    u = jnp.clip(u, 0.0, s - 1.001)
    v = jnp.clip(v, 0.0, s - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0)[..., None] if img.ndim == 3 else (u - u0)
    fv = (v - v0)[..., None] if img.ndim == 3 else (v - v0)
    a = img[v0, u0]
    b = img[v0, u0 + 1]
    c = img[v0 + 1, u0]
    d = img[v0 + 1, u0 + 1]
    return (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv


def vsm_shadow(moments_maps, shadow_mvps, cascade_dists, world_pos,
               view_depth, light_bleed=0.8):
    """Variance shadow maps (shadow.glsl:97-121): Chebyshev bound with
    light-bleed clamp + smoothstep remap.

    moments_maps: (CASCADES, S, S, 2) linearized (d, d²) moments;
    shadow_mvps: (CASCADES, 4, 4). Returns shadow factor (H, W) in [0,1].

    TPU shape: per-pixel cascade selection uses DENSE math (project
    against all cascades, one-hot select) and ONE bilinear fetch from a
    vertically stacked cascade atlas — per-pixel matrix/map gathers are
    the expensive thing on TPU, not the extra flops.
    """
    n_casc = moments_maps.shape[0]
    casc = select_cascade(view_depth, cascade_dists)          # (H, W)
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    sps = jnp.einsum("cij,hwj->chwi", shadow_mvps, p)          # (C, H, W, 4)
    sp = jnp.zeros_like(sps[0])
    for c in range(n_casc):
        sp = sp + jnp.where((casc == c)[..., None], sps[c], 0.0)
    w = sp[..., 3]
    ok = w > 1e-3
    ndc = sp[..., :3] / jnp.where(ok, w, 1.0)[..., None]
    uv = ndc[..., :2] * 0.5 + 0.5
    d = ndc[..., 2] * 0.5 + 0.5

    s = moments_maps.shape[1]
    u = uv[..., 0] * (s - 1)
    v = (1.0 - uv[..., 1]) * (s - 1)
    # atlas fetch: clamp v inside the selected cascade's band
    atlas = moments_maps.reshape(n_casc * s, s, 2)
    u = jnp.clip(u, 0.0, s - 1.001)
    v = jnp.clip(v, 0.0, s - 1.001) + casc.astype(jnp.float32) * s
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    v0 = jnp.minimum(v0, n_casc * s - 2)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    # quad-packed single fetch: gather cost on TPU scales with ROW COUNT,
    # so pre-pack the 2×2 bilinear footprint into one 8-float row (four
    # separate corner gathers cost ~18 ms/frame-batch at 32 envs)
    right = jnp.concatenate([atlas[:, 1:], atlas[:, -1:]], axis=1)
    down = jnp.concatenate([atlas[1:], atlas[-1:]], axis=0)
    down_r = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    quad = jnp.concatenate([atlas, right, down, down_r], axis=-1)  # (V,U,8)
    # flat gather_rows: per-env atlases stay fast-path gathers under vmap
    m4 = gather_rows(quad.reshape(-1, 8), v0 * s + u0)
    a, b = m4[..., 0:2], m4[..., 2:4]
    cc, dd = m4[..., 4:6], m4[..., 6:8]
    m = (a * (1 - fu) + b * fu) * (1 - fv) + (cc * (1 - fu) + dd * fu) * fv
    mu, m2 = m[..., 0], m[..., 1]
    var = jnp.maximum(m2 - mu * mu, 1e-5)
    diff = d - mu
    cheb = var / (var + diff * diff)
    p_lit = jnp.where(diff <= 0, 1.0, cheb)
    # light-bleed reduction: remap [bleed_clamp, 1]
    t = jnp.clip((p_lit - 0.15) / (0.95 - 0.15), 0.0, 1.0)
    p_lit = t * t * (3 - 2 * t)
    inb = ok & (uv[..., 0] >= 0) & (uv[..., 0] <= 1) \
        & (uv[..., 1] >= 0) & (uv[..., 1] <= 1)
    return jnp.where(inb, p_lit, 1.0)


def pcf_shadow(depth_maps, shadow_mvps, cascade_dists, world_pos,
               view_depth, normal, light_dir, kernel: int = 5):
    """PCF shadow estimator (shadow.glsl:20-50, 167-168): k×k depth
    compares with the slope-scaled bias
    max(0.0005·(1-NdotL), 0.0008)·max(w·0.02, 1).

    depth_maps: (CASCADES, S, S) stored depths in [0,1] (closer = smaller
    — the non-reversed convention of our shadow pass). Returns (H, W)
    shadow factor. The reference's reverse-z trick exists to fight fp
    precision on GL depth buffers; our maps are f32 linear so the
    straight compare is already well-conditioned.
    """
    n_casc = depth_maps.shape[0]
    casc = select_cascade(view_depth, cascade_dists)
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    sps = jnp.einsum("cij,hwj->chwi", shadow_mvps, p)
    sp = jnp.zeros_like(sps[0])
    for c in range(n_casc):
        sp = sp + jnp.where((casc == c)[..., None], sps[c], 0.0)
    w = sp[..., 3]
    ok = w > 1e-3
    ndc = sp[..., :3] / jnp.where(ok, w, 1.0)[..., None]
    uv = ndc[..., :2] * 0.5 + 0.5
    d = ndc[..., 2] * 0.5 + 0.5

    ndl = jnp.clip(jnp.sum(normal * (-light_dir)[None, None], -1), 0.0, 1.0)
    bias = jnp.maximum(0.0005 * (1.0 - ndl), 0.0008) \
        * jnp.maximum(w * 0.02, 1.0)

    s = depth_maps.shape[1]
    atlas = depth_maps.reshape(n_casc * s, s)
    u = jnp.clip(uv[..., 0] * (s - 1), 0.0, s - 1.0)
    v = jnp.clip((1.0 - uv[..., 1]) * (s - 1), 0.0, s - 1.0) \
        + casc.astype(jnp.float32) * s
    ui = u.astype(jnp.int32)
    vi = jnp.minimum(v.astype(jnp.int32), n_casc * s - 1)

    r = kernel // 2
    # all k² taps through ONE flat gather (separate fetches each pay a
    # dispatch; batched-operand form pays ~5× the row cost under vmap)
    idxs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            su = jnp.clip(ui + dx, 0, s - 1)
            sv = jnp.clip(vi + dy, casc * s, (casc + 1) * s - 1)
            idxs.append(sv * s + su)
    stored = gather_rows(atlas.reshape(-1), jnp.stack(idxs))  # (k², H, W)
    lit = jnp.sum(jnp.where((d - bias)[None] <= stored, 1.0, 0.0), axis=0)
    sf = lit / float(kernel * kernel)
    inb = ok & (uv[..., 0] >= 0) & (uv[..., 0] <= 1) \
        & (uv[..., 1] >= 0) & (uv[..., 1] <= 1)
    return jnp.where(inb, sf, 1.0)


# ---------------------------------------------------------------------------
# tonemap + OETF (tonemap.glsl, oetf.glsl)
# ---------------------------------------------------------------------------

def tonemap_reinhard(x):
    """1 - exp(-x) variant (tonemap.glsl:4-7)."""
    return 1.0 - jnp.exp(-x)


def tonemap_aces(x):
    """ACES filmic approximation (tonemap.glsl:8-12, Narkowicz fit)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def oetf_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * jnp.power(x, 1 / 2.4) - 0.055)


def oetf_pq(x, peak_nits=1000.0):
    """SMPTE ST.2084 PQ (oetf.glsl HDR output path)."""
    m1, m2 = 0.1593017578125, 78.84375
    c1, c2, c3 = 0.8359375, 18.8515625, 18.6875
    y = jnp.clip(x * peak_nits / 10000.0, 0.0, 1.0)
    yp = jnp.power(y, m1)
    return jnp.power((c1 + c2 * yp) / (1.0 + c3 * yp), m2)
