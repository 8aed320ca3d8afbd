"""Texture sampling for the shading path (reference: model3dtx texture
slots + model.frag's diffuse/normal/emission samplers).

Deferred texturing: per-pixel UV comes from the interpolated attribute
record; ``sample_bilinear`` is the texture fetch (wrap-repeat like the
reference's default sampler state). Textures are (H, W, C) float arrays
(decode_png → /255 on upload).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.gatherx import gather_rows


def _quad_pack(tex, wrap: bool):
    """Pre-pack each texel's 2×2 bilinear footprint into one row of 4C
    channels (self | right | down | down-right) so a bilinear fetch is
    ONE gather instead of four — gather cost on TPU scales with row
    count, not row width. Runs at texture scale (tiny vs pixel scale).
    wrap picks wrapped vs clamped neighbors (GL_REPEAT vs CLAMP)."""
    if wrap:
        right = jnp.roll(tex, -1, axis=-2)
    else:
        right = jnp.concatenate([tex[..., 1:, :], tex[..., -1:, :]],
                                axis=-2)
    down = jnp.roll(tex, -1, axis=-3) if wrap else jnp.concatenate(
        [tex[..., 1:, :, :], tex[..., -1:, :, :]], axis=-3)
    down_r = jnp.roll(right, -1, axis=-3) if wrap else jnp.concatenate(
        [right[..., 1:, :, :], right[..., -1:, :, :]], axis=-3)
    return jnp.concatenate([tex, right, down, down_r], axis=-1)


def upload_texture(rgba_u8: np.ndarray) -> jnp.ndarray:
    """uint8 RGBA → float texture (texture_load analogue)."""
    return jnp.asarray(rgba_u8, jnp.float32) / 255.0


def sample_bilinear(tex, uv, wrap: bool = True):
    """Bilinear fetch. tex (Ht, Wt, C); uv (..., 2) in texture space.
    wrap=True repeats (GL_REPEAT, the terrain/model default)."""
    ht, wt = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * wt - 0.5
    v = uv[..., 1] * ht - 0.5
    if wrap:
        u = jnp.mod(u, wt)
        v = jnp.mod(v, ht)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    if wrap:
        u0 = jnp.mod(u0, wt)
        v0 = jnp.mod(v0, ht)
    else:
        u0 = jnp.clip(u0, 0, wt - 1)
        v0 = jnp.clip(v0, 0, ht - 1)
    C = tex.shape[-1]
    quad = _quad_pack(tex, wrap)                  # (Ht, Wt, 4C)
    m = gather_rows(quad.reshape(-1, 4 * C), v0 * wt + u0)
    a, b = m[..., :C], m[..., C:2 * C]
    c, d = m[..., 2 * C:3 * C], m[..., 3 * C:]
    return (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv


def sample_nearest(tex, uv, wrap: bool = True):
    ht, wt = tex.shape[0], tex.shape[1]
    u = (uv[..., 0] * wt).astype(jnp.int32)
    v = (uv[..., 1] * ht).astype(jnp.int32)
    if wrap:
        u = jnp.mod(u, wt)
        v = jnp.mod(v, ht)
    else:
        u = jnp.clip(u, 0, wt - 1)
        v = jnp.clip(v, 0, ht - 1)
    return tex[v, u]


def sample_layered(tex, layer, uv, wrap: bool = True):
    """Bilinear fetch from stacked per-model texture layers.

    tex (L, Ht, Wt, C); layer (...,) int32 selecting the model's texture
    set (model3dtx's per-model textures, model.h:213-223); uv (..., 2).
    """
    ht, wt = tex.shape[1], tex.shape[2]
    u = uv[..., 0] * wt - 0.5
    v = uv[..., 1] * ht - 0.5
    if wrap:
        u = jnp.mod(u, wt)
        v = jnp.mod(v, ht)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    if wrap:
        u0 = jnp.mod(u0, wt)
        v0 = jnp.mod(v0, ht)
    else:
        u0 = jnp.clip(u0, 0, wt - 1)
        v0 = jnp.clip(v0, 0, ht - 1)
    li = jnp.clip(layer, 0, tex.shape[0] - 1)
    C = tex.shape[-1]
    quad = _quad_pack(tex, wrap)                  # (L, Ht, Wt, 4C)
    m = gather_rows(quad.reshape(-1, 4 * C),
                    (li * ht + v0) * wt + u0)
    a, b = m[..., :C], m[..., C:2 * C]
    c, d = m[..., 2 * C:3 * C], m[..., 3 * C:]
    return (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv
