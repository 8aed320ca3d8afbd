"""Post-processing image ops (reference: shaders/ post chain; SURVEY §8.6).

Every pass is a pure image function (H, W[, C]) → image. XLA fuses the
elementwise chains; the separable blurs lower to cheap shifted adds.
These are the building blocks pipeline.py assembles into the reference's
pass graph (pipeline-builder.c:182-613).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gatherx import gather_rows


def _pad_edge(img, ry: int, rx: int):
    """Edge-pad once for a stencil of radius (ry, rx). jnp.pad(edge)
    lowers to concat-of-slices and MATERIALIZES — so consumers must pad
    ONCE and take many fused slices via _tap, never pad per tap (the
    per-tap form cost 9.6 ms of a 24.7 ms 720p frame)."""
    pads = ((ry, ry), (rx, rx)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pads, mode="edge")


def _tap(p, dy: int, dx: int, ry: int, rx: int, h: int, w: int):
    """Shifted window of a padded image: result[y, x] =
    img[clamp(y+dy), clamp(x+dx)] given p = _pad_edge(img, ry, rx)."""
    return p[ry + dy:ry + dy + h, rx + dx:rx + dx + w]


def _shift2(img, dy, dx):
    """Clamped-edge shift (texture clamp-to-edge semantics). One-off
    use only — for multi-tap stencils use _pad_edge + _tap so the pad
    materializes once per stencil, not once per tap."""
    h, w = img.shape[0], img.shape[1]
    p = _pad_edge(img, abs(dy), abs(dx))
    return _tap(p, dy, dx, abs(dy), abs(dx), h, w)


def downsample2(img):
    """½-res box downsample; chained twice for the bloom ¼ buffer
    (downsample.frag: 4-corner + center weighted). reduce_window: the
    strided-slice form (c[0::2, 0::2] + …) pays lane-dim stride-2
    relayouts — 9.6 ms of a 24.7 ms 720p frame; the pooled form lowers
    to the TPU window reducer."""
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    c = img[:h, :w]
    win = (2, 2) + (1,) * (img.ndim - 2)
    return jax.lax.reduce_window(c, 0.0, jax.lax.add, win, win,
                                 "VALID") * 0.25


def downsample_pool(img, f: int):
    """f×f average pool (used to build the ¼-res SSAO inputs — strided
    ::f decimation pays the same lane-stride penalty as downsample2)."""
    h, w = img.shape[0] // f * f, img.shape[1] // f * f
    c = img[:h, :w]
    win = (f, f) + (1,) * (img.ndim - 2)
    return jax.lax.reduce_window(c, 0.0, jax.lax.add, win, win,
                                 "VALID") / (f * f)


def upsample2(img, out_h: int, out_w: int):
    """Upsample to (out_h, out_w) (upsample.frag). Integer scale factors
    take a repeat + half-pixel smooth path — far cheaper on TPU than a
    general gather-based resize; other shapes fall back to
    jax.image.resize."""
    h, w = img.shape[0], img.shape[1]
    if out_h % h == 0 and out_w % w == 0:
        fy, fx = out_h // h, out_w // w
        up = jnp.repeat(jnp.repeat(img, fy, axis=0), fx, axis=1)
        # one smoothing tap to soften the blocks (bloom/AO are low-freq)
        pd = _pad_edge(up, 1, 1)
        return 0.25 * (up + _tap(pd, 0, 1, 1, 1, out_h, out_w)
                       + _tap(pd, 1, 0, 1, 1, out_h, out_w)
                       + _tap(pd, 1, 1, 1, 1, out_h, out_w))
    return jax.image.resize(img, (out_h, out_w) + img.shape[2:], "bilinear")


def _axis_bilinear_up(x, f: int):
    """True bilinear ×f upsample along axis 0, gather-free: repeat +
    two edge-clamped shifts + a per-phase weight vector (output center
    (j+0.5)/f − 0.5 interpolates the two nearest input samples)."""
    n = x.shape[0]
    up = jnp.repeat(x, f, axis=0)
    nxt = jnp.concatenate([up[f:], jnp.repeat(up[-1:], f, axis=0)], 0)
    prv = jnp.concatenate([jnp.repeat(up[:1], f, axis=0), up[:-f]], 0)
    k = jnp.arange(n * f) % f
    g = (k.astype(x.dtype) + 0.5) / f - 0.5
    shape = (n * f,) + (1,) * (x.ndim - 1)
    g = g.reshape(shape)
    w = jnp.abs(g)
    nb = jnp.where(g >= 0, nxt, prv)
    return (1.0 - w) * up + w * nb


def upsample_bilinear(img, out_h: int, out_w: int):
    """Exact separable bilinear upsample (the internal-resolution
    lever's final LDR upscale). Integer factors are gather-free
    (repeat + shifts); other shapes fall back to jax.image.resize."""
    h, w = img.shape[0], img.shape[1]
    if out_h % h == 0 and out_w % w == 0:
        img = _axis_bilinear_up(img, out_h // h)
        img = jnp.moveaxis(
            _axis_bilinear_up(jnp.moveaxis(img, 1, 0), out_w // w), 0, 1)
        return img
    return jax.image.resize(img, (out_h, out_w) + img.shape[2:], "bilinear")


# 11-tap Gaussian, matching the reference's separable blur weights
_G11 = np.array([0.0093, 0.028002, 0.065984, 0.121703, 0.175713, 0.198596,
                 0.175713, 0.121703, 0.065984, 0.028002, 0.0093], np.float32)
_G11 /= _G11.sum()


def gauss_blur_h(img):
    h, w = img.shape[0], img.shape[1]
    pd = _pad_edge(img, 0, 5)
    acc = jnp.zeros_like(img)
    for i, wgt in enumerate(_G11):
        acc = acc + wgt * _tap(pd, 0, i - 5, 0, 5, h, w)
    return acc


def gauss_blur_v(img):
    h, w = img.shape[0], img.shape[1]
    pd = _pad_edge(img, 5, 0)
    acc = jnp.zeros_like(img)
    for i, wgt in enumerate(_G11):
        acc = acc + wgt * _tap(pd, i - 5, 0, 5, 0, h, w)
    return acc


def bloom_threshold(emission, threshold, intensity):
    """RT1 emission shaping (model.frag:84-101):
    max(e - threshold, 0) · |intensity|."""
    return jnp.maximum(emission - threshold, 0.0) * jnp.abs(intensity)


def bloom_chain(hdr_emission, out_h: int, out_w: int, intensity=1.0,
                exposure=1.0):
    """¼-res downsample → v/h Gaussian → upsample recombine
    (pipeline-builder.c:366-411; upsample.frag math)."""
    q = downsample2(downsample2(hdr_emission))
    q = gauss_blur_v(gauss_blur_h(q))
    up = upsample2(q, out_h, out_w)
    return (hdr_emission + up * intensity) * exposure


# ---------------------------------------------------------------------------
# edge detection (edge_filter.glsl:22-101)
# ---------------------------------------------------------------------------

def sobel_edges(img_luma):
    """Sobel magnitude on a single-channel image."""
    h, w = img_luma.shape[0], img_luma.shape[1]
    pd = _pad_edge(img_luma, 1, 1)

    def t(dy, dx):
        return _tap(pd, dy, dx, 1, 1, h, w)

    gx = (t(-1, 1) + 2 * t(0, 1) + t(1, 1)
          - t(-1, -1) - 2 * t(0, -1) - t(1, -1))
    gy = (t(1, -1) + 2 * t(1, 0) + t(1, 1)
          - t(-1, -1) - 2 * t(-1, 0) - t(-1, 1))
    return jnp.sqrt(gx * gx + gy * gy)


def laplace_edges(depth_lin, kernel: int = 3):
    """Laplacian on linearized depth (edge_filter.glsl laplace path)."""
    h, w = depth_lin.shape[0], depth_lin.shape[1]
    pd = _pad_edge(depth_lin, 1, 1)
    if kernel == 3:
        acc = -4.0 * depth_lin
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            acc = acc + _tap(pd, dy, dx, 1, 1, h, w)
    else:  # 5-point ring
        acc = -8.0 * depth_lin
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                acc = acc + _tap(pd, dy, dx, 1, 1, h, w)
    return jnp.abs(acc)


# ---------------------------------------------------------------------------
# SMAA-lite (smaa-blend-weights.frag:13-52 + neighborhood blend)
# ---------------------------------------------------------------------------

def smaa_blend_weights(edges):
    """4-direction edge continuity weights from an edge-strength image."""
    h, w = edges.shape[0], edges.shape[1]
    pd = _pad_edge(edges, 1, 1)
    el = _tap(pd, 0, -1, 1, 1, h, w)
    er = _tap(pd, 0, 1, 1, 1, h, w)
    eu = _tap(pd, -1, 0, 1, 1, h, w)
    ed = _tap(pd, 1, 0, 1, 1, h, w)
    tot = el + er + eu + ed + 1e-6
    return jnp.stack([el, er, eu, ed], -1) / tot[..., None] \
        * jnp.clip(edges, 0.0, 1.0)[..., None]


def smaa_neighborhood_blend(color, weights):
    """Blend each pixel toward its neighbors by the SMAA weights
    (combine.frag:67-68, 94-97)."""
    wsum = jnp.sum(weights, -1, keepdims=True)
    h, w = color.shape[0], color.shape[1]
    pd = _pad_edge(color, 1, 1)
    blended = (
        weights[..., 0:1] * _tap(pd, 0, -1, 1, 1, h, w)
        + weights[..., 1:2] * _tap(pd, 0, 1, 1, 1, h, w)
        + weights[..., 2:3] * _tap(pd, -1, 0, 1, 1, h, w)
        + weights[..., 3:4] * _tap(pd, 1, 0, 1, 1, h, w)
    )
    return color * (1 - wsum * 0.5) + blended * 0.5


# ---------------------------------------------------------------------------
# SSAO (ssao.frag:17-59; kernel per ssao.{c,h}: 16 hemisphere samples)
# ---------------------------------------------------------------------------

SSAO_KERNEL_SIZE = 16  # shader_constants.h:11-12


def ssao_kernel(key):
    """16 hemisphere samples, scaled toward the center (ssao.c:81)."""
    k1, k2, k3 = jax.random.split(key, 3)
    v = jnp.stack([
        jax.random.uniform(k1, (SSAO_KERNEL_SIZE,), minval=-1, maxval=1),
        jax.random.uniform(k2, (SSAO_KERNEL_SIZE,), minval=-1, maxval=1),
        jax.random.uniform(k3, (SSAO_KERNEL_SIZE,), minval=0, maxval=1),
    ], -1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    scale = jnp.linspace(0.1, 1.0, SSAO_KERNEL_SIZE) ** 2
    return v * scale[:, None]


def ssao(view_pos, view_normal, kernel, radius=0.5, bias=0.025):
    """Screen-space AO: sample view-space offsets around each pixel,
    compare stored depth (ssao.frag:17-59). view_pos: (H, W, 3) view
    -space positions (from depth); returns (H, W) occlusion in [0, 1]
    (1 = unoccluded)."""
    H, W = view_pos.shape[:2]
    occ = jnp.zeros((H, W))
    # TBN per pixel from a cheap per-pixel rotation (blue-noise analogue)
    xs = jnp.arange(W)[None, :].astype(jnp.float32)
    ys = jnp.arange(H)[:, None].astype(jnp.float32)
    ang = (xs * 12.9898 + ys * 78.233) % (2 * jnp.pi)
    rnd = jnp.stack([jnp.cos(ang), jnp.sin(ang), jnp.zeros_like(ang)], -1)
    n = view_normal
    t = rnd - n * jnp.sum(rnd * n, -1, keepdims=True)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
    b = jnp.cross(n, t)

    depth = view_pos[..., 2]
    # pixel↔view scale is loop-invariant: hoist (was recomputed per tap)
    dzdx = (_shift2(view_pos[..., 0], 0, 1) - _shift2(view_pos[..., 0], 0, -1)) * 0.5
    dzdy = (_shift2(view_pos[..., 1], 1, 0) - _shift2(view_pos[..., 1], -1, 0)) * 0.5
    dzdx = jnp.where(jnp.abs(dzdx) < 1e-6, 1e-6, dzdx)
    dzdy = jnp.where(jnp.abs(dzdy) < 1e-6, 1e-6, dzdy)
    # all 16 taps in ONE gather: 16 separate depth[sv, su] fetches cost
    # a kernel launch each (~2.8 ms/launch at 64 envs×64² in the r3
    # trace); stacking the indices first amortizes it
    sus, svs, szs = [], [], []
    for i in range(SSAO_KERNEL_SIZE):
        k = kernel[i]
        offs = t * k[0] + b * k[1] + n * k[2]
        sample = view_pos + offs * radius
        du = (sample[..., 0] - view_pos[..., 0]) / dzdx
        dv = (sample[..., 1] - view_pos[..., 1]) / dzdy
        sus.append(jnp.clip(xs + du, 0, W - 1).astype(jnp.int32))
        svs.append(jnp.clip(ys + dv, 0, H - 1).astype(jnp.int32))
        szs.append(sample[..., 2])
    # flat row gather so the per-env depth map stays a shared-table
    # gather under vmap (batched-operand form: 11.1 ms/frame @ 16 envs)
    flat_idx = jnp.stack(svs) * W + jnp.stack(sus)
    stored = gather_rows(depth.reshape(H * W), flat_idx)  # (K, H, W)
    sz = jnp.stack(szs)
    range_check = jnp.clip(radius / jnp.maximum(
        jnp.abs(depth[None] - stored), 1e-4), 0.0, 1.0)
    occ = jnp.sum(jnp.where(stored >= sz + bias, 1.0, 0.0) * range_check,
                  axis=0)
    return 1.0 - occ / SSAO_KERNEL_SIZE


def ssao_shift(view_pos, view_normal, radius: float = 0.5,
               bias: float = 0.025):
    """Gather-free SSAO: taps at FIXED screen-space offsets read via
    static shifts (jnp.roll-style slicing fuses — no gather op at all),
    scored horizon-style: a neighbor occludes when the unit vector to
    its surface point rises above the tangent plane, attenuated by
    world distance so far silhouettes don't darken.

    The reference samples a view-space hemisphere kernel per pixel
    (ssao.c:81, ssao.frag:17-59) — that needs a data-dependent image
    gather (16·H·W rows, one of the two largest gather sites in the
    composed trace). This formulation trades the world-space-exact
    sample sphere for screen-fixed taps; with the 4×4 blur the result
    is visually equivalent at the ¼-res it runs at, and the parity
    variant stays available as ``ssao`` (RenderOptions.ssao_mode).

    view_pos (H, W, 3) view-space positions; returns (H, W) in [0, 1]
    (1 = unoccluded)."""
    n = view_normal
    # 16 taps: 2 spirals of 8 at 1..5-px radii (¼-res pixels)
    taps = [(0, 1), (1, 1), (2, 0), (2, -2), (0, -3), (-3, -2),
            (-4, 0), (-3, 3), (0, 5), (4, 4), (1, -2), (-2, 1),
            (5, 0), (-5, 1), (-1, -5), (2, 4)]
    occ = jnp.zeros(view_pos.shape[:2], view_pos.dtype)
    h, w = view_pos.shape[0], view_pos.shape[1]
    pd = _pad_edge(view_pos, 5, 5)
    for dy, dx in taps:
        dvec = _tap(pd, dy, dx, 5, 5, h, w) - view_pos
        d2 = jnp.sum(dvec * dvec, -1)
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-8))
        # horizon term: sin of elevation above the tangent plane
        elev = jnp.sum(n * dvec, -1) * inv_d
        # range attenuation: occluders beyond `radius` fade out
        atten = jnp.clip(radius * radius / jnp.maximum(d2, 1e-8),
                         0.0, 1.0)
        occ = occ + jnp.maximum(elev - bias, 0.0) * atten
    return 1.0 - jnp.clip(occ / (len(taps) * 0.5), 0.0, 1.0)


def ssao_blur(ao):
    """4×4 box blur of the ¼-res AO (pipeline-builder.c:457-486)."""
    acc = jnp.zeros_like(ao)
    h, w = ao.shape[0], ao.shape[1]
    pd = _pad_edge(ao, 2, 2)
    for dy in (-1, 0, 1, 2):
        for dx in (-1, 0, 1, 2):
            acc = acc + _tap(pd, dy, dx, 2, 2, h, w)
    return acc / 16.0


# ---------------------------------------------------------------------------
# combine helpers (combine.frag:35-117)
# ---------------------------------------------------------------------------

def radial_fog(color, view_dist, fog_color, fog_near, fog_far, noise=None):
    f = jnp.clip((view_dist - fog_near) / jnp.maximum(fog_far - fog_near, 1e-6),
                 0.0, 1.0)
    fc = fog_color[None, None, :]
    if noise is not None:
        fc = fc * (0.75 + 0.5 * noise[..., None])
    return color * (1 - f[..., None]) + fc * f[..., None]


def contrast(color, amount):
    """Contrast about 0.5 (contrast.frag; combine.frag)."""
    return jnp.clip((color - 0.5) * (1.0 + amount) + 0.5, 0.0, 1.0)


def film_grain(color, noise2d, strength=0.04):
    """Blue-noise luma-weighted grain (combine.frag:50-63).

    noise2d: (S, S) or (S, S, 3) grain texture, wrap-tiled across the
    frame like the reference's REPEAT-sampled blue-noise texture."""
    h, w = color.shape[0], color.shape[1]
    n = noise2d if noise2d.ndim == 3 else noise2d[..., None]
    ry = -(-h // n.shape[0])
    rx = -(-w // n.shape[1])
    if ry > 1 or rx > 1:
        n = jnp.tile(n, (ry, rx, 1))
    n = n[:h, :w]
    luma = jnp.sum(color * jnp.array([0.2126, 0.7152, 0.0722]), -1, keepdims=True)
    weight = 1.0 - jnp.clip(luma, 0.0, 1.0)
    return color + (n - 0.5) * strength * weight
