"""Color-grading 3D LUTs (reference: core/lut.{c,h}).

The reference generates 14 procedural grading presets on the CPU into
RGBA16F 3D textures (lut.c:323-363) and trilinearly samples them in the
combine pass (lut.glsl). Here each preset is a pure RGB→RGB transform;
``bake_lut`` evaluates it on a size³ lattice and ``apply_lut`` does the
trilinear fetch on device. Preset names/exposure/contrast mirror the
lut_presets table (lut.c:172-258); the transforms are this engine's own
implementations of the same grading intents.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp


def _clamp(x):
    return jnp.clip(x, 0.0, 1.0)


def _luma(c):
    return jnp.sum(c * jnp.array([0.3, 0.59, 0.11]), -1, keepdims=True)


def _identity(c):
    return c


def _orange_blue_filmic(c):
    l = _luma(c)
    warm = c * jnp.array([1.15, 1.0, 0.8])
    cool = c * jnp.array([0.85, 0.95, 1.25])
    return _clamp(warm * l + cool * (1 - l))


def _comic(c, channel):
    boost = jnp.zeros(3).at[channel].set(0.35)
    q = jnp.round(c * 5.0) / 5.0   # posterize
    return _clamp(q * (1.0 - 0.2) + boost * _luma(c))


def _sunset_warm(c):
    return _clamp(c * jnp.array([1.2, 1.0, 0.75]) + jnp.array([0.05, 0.02, 0.0]))


def _hyper_sunset(c):
    g = jnp.power(_clamp(c), jnp.array([0.8, 1.0, 1.3]))
    return _clamp(g * jnp.array([1.4, 0.95, 0.7]))


def _green_matrix(c):
    l = _luma(c)
    return _clamp(jnp.concatenate([l * 0.2, l * 1.1, l * 0.3], -1))


def _scifi_bluegreen(c):
    return _clamp(c * jnp.array([0.7, 1.1, 1.2]))


def _scifi_neon(c):
    g = jnp.power(_clamp(c), 1.5)
    return _clamp(g * jnp.array([1.3, 0.7, 1.5]))


def _deep_sea_abyss(c):
    l = _luma(c)
    return _clamp(jnp.concatenate(
        [c[..., :1] * 0.25, c[..., 1:2] * 0.6 + l * 0.1,
         c[..., 2:3] * 0.9 + l * 0.2], -1))


def _bloodveil_crimson(c):
    l = _luma(c)
    return _clamp(jnp.concatenate(
        [c[..., :1] * 1.3 + l * 0.2, c[..., 1:2] * 0.5, c[..., 2:3] * 0.5], -1))


def _mad_max_bleach(c):
    l = _luma(c)
    harsh = jnp.minimum(1.0, l * 1.6)
    return _clamp(jnp.concatenate([
        jnp.maximum(c[..., :1], harsh),
        jnp.maximum(c[..., 1:2] * 0.9, harsh * 0.8),
        jnp.maximum(c[..., 2:3] * 0.6, harsh * 0.6),
    ], -1))


def _teal_orange(c):
    p = jnp.power(_clamp(c), jnp.array([0.9, 1.0, 1.1]))
    r = p[..., :1] * 1.3 - p[..., 2:3] * 0.2
    g = p[..., 1:2] + p[..., 2:3] * 0.05
    b = p[..., 2:3] * 1.1 - p[..., :1] * 0.2 - p[..., 1:2] * 0.1
    return _clamp(jnp.concatenate([r, g, b], -1))


@dataclass(frozen=True)
class LutPreset:
    name: str
    fn: Callable
    exposure: float
    contrast: float


# preset table mirrors lut.c:172-258 (names/exposure/contrast)
LUT_PRESETS = (
    LutPreset("identity", _identity, 2.0, 0.05),
    LutPreset("orange blue filmic", _orange_blue_filmic, 1.8, 0.05),
    LutPreset("comic red", lambda c: _comic(c, 0), 2.4, 0.05),
    LutPreset("comic green", lambda c: _comic(c, 1), 2.4, 0.05),
    LutPreset("comic blue", lambda c: _comic(c, 2), 2.4, 0.05),
    LutPreset("sunset warm", _sunset_warm, 2.0, 0.01),
    LutPreset("hyper sunset", _hyper_sunset, 1.0, 0.05),
    LutPreset("green matrix", _green_matrix, 2.0, 0.05),
    LutPreset("scifi bluegreen", _scifi_bluegreen, 2.0, 0.05),
    LutPreset("scifi neon", _scifi_neon, 5.0, 0.01),
    LutPreset("deep sea abyss", _deep_sea_abyss, 2.4, 0.1),
    LutPreset("bloodveil crimson", _bloodveil_crimson, 2.4, 0.1),
    LutPreset("mad max bleach", _mad_max_bleach, 2.0, 0.05),
    LutPreset("teal orange", _teal_orange, 2.0, 0.05),
)


def lut_find(name: str) -> LutPreset:
    for p in LUT_PRESETS:
        if p.name == name:
            return p
    raise KeyError(name)


def bake_lut(preset: LutPreset, size: int = 32) -> jnp.ndarray:
    """(size, size, size, 3) float LUT volume (lut_generate,
    lut.c:323-363): evaluate the transform on the RGB lattice."""
    ax = jnp.linspace(0.0, 1.0, size)
    r, g, b = jnp.meshgrid(ax, ax, ax, indexing="ij")
    rgb = jnp.stack([r, g, b], -1)
    return preset.fn(rgb)


def apply_lut(color, lut_volume):
    """Trilinear 3D LUT fetch (lut.glsl), color (..., 3) in [0, 1]."""
    s = lut_volume.shape[0]
    c = jnp.clip(color, 0.0, 1.0) * (s - 1)
    i0 = jnp.floor(c).astype(jnp.int32)
    i0 = jnp.minimum(i0, s - 2)
    f = c - i0
    r0, g0, b0 = i0[..., 0], i0[..., 1], i0[..., 2]

    def at(dr, dg, db):
        return lut_volume[r0 + dr, g0 + dg, b0 + db]

    fr, fg, fb = f[..., 0:1], f[..., 1:2], f[..., 2:3]
    c00 = at(0, 0, 0) * (1 - fr) + at(1, 0, 0) * fr
    c10 = at(0, 1, 0) * (1 - fr) + at(1, 1, 0) * fr
    c01 = at(0, 0, 1) * (1 - fr) + at(1, 0, 1) * fr
    c11 = at(0, 1, 1) * (1 - fr) + at(1, 1, 1) * fr
    c0 = c00 * (1 - fg) + c10 * fg
    c1 = c01 * (1 - fg) + c11 * fg
    return c0 * (1 - fb) + c1 * fb
