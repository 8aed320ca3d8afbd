"""CPU-style canvas ops + texture format conversions (reference:
render-texture.c + draw.c — blit/fill/blend across RGBA8/16F/32F, the
most unit-tested subsystem in the reference, test.c:906-1279).

Pure jnp image ops usable host- or device-side. Formats are numpy/jnp
dtypes: uint8 (RGBA8), float16 (RGBA16F), float32 (RGBA32F); conversions
normalize u8 ↔ [0, 1] floats like the reference's texel converters.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def convert(img, dtype):
    """Format conversion with u8 normalization semantics."""
    src = img.dtype
    dtype = jnp.dtype(dtype)
    if src == dtype:
        return img
    if src == jnp.uint8:
        f = img.astype(jnp.float32) / 255.0
        return f.astype(dtype) if dtype != jnp.uint8 else img
    # float source
    if dtype == jnp.uint8:
        return jnp.clip(jnp.rint(img.astype(jnp.float32) * 255.0), 0, 255
                        ).astype(jnp.uint8)
    return img.astype(dtype)


def canvas_fill(img, color):
    """Fill with a color (float colors auto-quantize for u8 canvases)."""
    c = jnp.asarray(color)
    if img.dtype == jnp.uint8 and c.dtype != jnp.uint8:
        c = jnp.clip(jnp.rint(c * 255.0), 0, 255).astype(jnp.uint8)
    return jnp.broadcast_to(c.astype(img.dtype), img.shape)


def canvas_blit(dst, src, x: int, y: int):
    """Copy src onto dst at (x, y), clipped; formats converted to dst's."""
    H, W = dst.shape[0], dst.shape[1]
    h, w = src.shape[0], src.shape[1]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, W), min(y + h, H)
    if x1 <= x0 or y1 <= y0:
        return dst
    s = convert(src, dst.dtype)[y0 - y : y1 - y, x0 - x : x1 - x]
    return dst.at[y0:y1, x0:x1].set(s)


def canvas_blend(dst, src, x: int, y: int):
    """Alpha-blend an RGBA src over dst at (x, y) (premultiply-free
    src-over, draw.c blend semantics)."""
    H, W = dst.shape[0], dst.shape[1]
    h, w = src.shape[0], src.shape[1]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, W), min(y + h, H)
    if x1 <= x0 or y1 <= y0:
        return dst
    s = convert(src, jnp.float32)[y0 - y : y1 - y, x0 - x : x1 - x]
    d = convert(dst[y0:y1, x0:x1], jnp.float32)
    a = s[..., 3:4]
    out_rgb = s[..., :3] * a + d[..., :3] * (1 - a)
    out_a = a + d[..., 3:4] * (1 - a)
    out = jnp.concatenate([out_rgb, out_a], -1)
    return dst.at[y0:y1, x0:x1].set(convert(out, dst.dtype))
