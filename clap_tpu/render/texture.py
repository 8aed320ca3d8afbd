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
        u1 = jnp.mod(u0 + 1, wt)
        v1 = jnp.mod(v0 + 1, ht)
        u0 = jnp.mod(u0, wt)
        v0 = jnp.mod(v0, ht)
    else:
        u0 = jnp.clip(u0, 0, wt - 1)
        v0 = jnp.clip(v0, 0, ht - 1)
        u1 = jnp.clip(u0 + 1, 0, wt - 1)
        v1 = jnp.clip(v0 + 1, 0, ht - 1)
    a = tex[v0, u0]
    b = tex[v0, u1]
    c = tex[v1, u0]
    d = tex[v1, u1]
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
        u1 = jnp.mod(u0 + 1, wt)
        v1 = jnp.mod(v0 + 1, ht)
        u0 = jnp.mod(u0, wt)
        v0 = jnp.mod(v0, ht)
    else:
        u1 = jnp.clip(u0 + 1, 0, wt - 1)
        v1 = jnp.clip(v0 + 1, 0, ht - 1)
        u0 = jnp.clip(u0, 0, wt - 1)
        v0 = jnp.clip(v0, 0, ht - 1)
    li = jnp.clip(layer, 0, tex.shape[0] - 1)
    a = tex[li, v0, u0]
    b = tex[li, v0, u1]
    c = tex[li, v1, u0]
    d = tex[li, v1, u1]
    return (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv
