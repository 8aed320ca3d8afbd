"""Baked noise textures (reference: core/noise.{c,h}).

- ``noise_grad3d``: tileable 3D fBm gradient noise baked to an RGBA8
  volume (noise_grad3d_bake_rgba8, noise.c:223-270): central-difference
  gradient of periodic value-noise fBm, normalized and packed to
  [0,255]. The hash matches hash31 (noise.h:9-17) bit-for-bit so the
  baked volume equals the reference's.
- ``blue_noise2d``: film-grain blue noise via FFT spectral shaping
  (blue_noise2d_tex, noise.c:96-148): random RGB luma-weighted noise,
  per-channel FFT, radial high-pass gain r/r_max, inverse FFT. The
  reference runs kissfft on the CPU; here it's jnp.fft on device.

Bakes run once at engine init (clap_init: ref_new(noise3d),
clap.c:1149) and upload as constants — compute path stays pure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hash31(x, y, z, seed):
    """noise.h:9-17, exact integer replica (uint32 wraparound)."""
    x = np.asarray(x).astype(np.uint32)
    y = np.asarray(y).astype(np.uint32)
    z = np.asarray(z).astype(np.uint32)
    with np.errstate(over="ignore"):
        h = (x * np.uint32(374761393) + y * np.uint32(668265263)
             + z * np.uint32(362437) + np.uint32(seed) * np.uint32(2246822519))
        h = (h ^ (h >> np.uint32(13))) * np.uint32(1274126177)
        h = h ^ (h >> np.uint32(16))
    return h.astype(np.float64) * (1.0 / 4294967296.0)


def _smooth(t):
    return t * t * (3.0 - 2.0 * t)


def value_noise3d_periodic(x, y, z, period: int, seed: int):
    """noise.c:172-204 vectorized (numpy, host bake)."""
    xi0 = np.floor(x).astype(np.int64)
    yi0 = np.floor(y).astype(np.int64)
    zi0 = np.floor(z).astype(np.int64)
    xf, yf, zf = x - xi0, y - yi0, z - zi0

    def wrap(i):
        return (i % period + period) % period

    c = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c[(dx, dy, dz)] = hash31(wrap(xi0 + dx), wrap(yi0 + dy),
                                         wrap(zi0 + dz), seed)
    ux, uy, uz = _smooth(xf), _smooth(yf), _smooth(zf)
    x00 = c[(0, 0, 0)] * (1 - ux) + c[(1, 0, 0)] * ux
    x10 = c[(0, 1, 0)] * (1 - ux) + c[(1, 1, 0)] * ux
    x01 = c[(0, 0, 1)] * (1 - ux) + c[(1, 0, 1)] * ux
    x11 = c[(0, 1, 1)] * (1 - ux) + c[(1, 1, 1)] * ux
    y0 = x00 * (1 - uy) + x10 * uy
    y1 = x01 * (1 - uy) + x11 * uy
    return y0 * (1 - uz) + y1 * uz


def fbm3_periodic(x, y, z, octaves: int, lacunarity: float, gain: float,
                  period: int, seed: int):
    """noise.c:206-221."""
    a, v = 0.5, np.zeros_like(np.asarray(x, np.float64))
    fx, fy, fz = np.asarray(x, np.float64), np.asarray(y, np.float64), np.asarray(z, np.float64)
    p = period
    for i in range(octaves):
        v = v + value_noise3d_periodic(fx, fy, fz, p, seed + i) * a
        fx, fy, fz = fx * lacunarity, fy * lacunarity, fz * lacunarity
        p = int(round(p * lacunarity))
        a *= gain
    return v


def noise_grad3d(size: int = 32, octaves: int = 4, lacunarity: float = 2.0,
                 gain: float = 0.5, period_units: float = 8.0,
                 seed: int = 1337) -> np.ndarray:
    """(size, size, size, 4) uint8 baked gradient volume
    (noise_grad3d_bake_rgba8, noise.c:223-270)."""
    step = period_units / size
    eps = step
    zs, ys, xs = np.meshgrid(np.arange(size) * step, np.arange(size) * step,
                             np.arange(size) * step, indexing="ij")
    p = int(period_units)

    def f(px, py, pz):
        return fbm3_periodic(px, py, pz, octaves, lacunarity, gain, p, seed)

    gx = (f(xs + eps, ys, zs) - f(xs - eps, ys, zs)) * (0.5 / eps)
    gy = (f(xs, ys + eps, zs) - f(xs, ys - eps, zs)) * (0.5 / eps)
    gz = (f(xs, ys, zs + eps) - f(xs, ys, zs - eps)) * (0.5 / eps)
    ln = np.sqrt(np.maximum(gx * gx + gy * gy + gz * gz, 1e-30))
    out = np.zeros((size, size, size, 4), np.uint8)
    out[..., 0] = np.rint((gx / ln * 0.5 + 0.5) * 255).astype(np.uint8)
    out[..., 1] = np.rint((gy / ln * 0.5 + 0.5) * 255).astype(np.uint8)
    out[..., 2] = np.rint((gz / ln * 0.5 + 0.5) * 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# device-side analytic noise (the TPU replacement for sampling the baked
# volume): per-pixel 3D-texture fetches would be H·W trilinear gathers —
# the attr-gather cost class the renderer just eliminated. The same
# periodic-fBm gradient field the RGBA8 bake stores is pure hash+lerp
# VPU math, so consumers (fog, material noise) evaluate it analytically.
# ---------------------------------------------------------------------------

def _hash31_jnp(x, y, z, seed):
    """hash31 (noise.h:9-17) on device, exact uint32 wraparound."""
    x = x.astype(jnp.uint32)
    y = y.astype(jnp.uint32)
    z = z.astype(jnp.uint32)
    h = (x * jnp.uint32(374761393) + y * jnp.uint32(668265263)
         + z * jnp.uint32(362437)
         + jnp.uint32(seed) * jnp.uint32(2246822519))
    h = (h ^ (h >> jnp.uint32(13))) * jnp.uint32(1274126177)
    h = h ^ (h >> jnp.uint32(16))
    return h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def _value_noise3d_jnp(x, y, z, period, seed):
    """value_noise3d_periodic (noise.c:172-204) on device."""
    xi0 = jnp.floor(x).astype(jnp.int32)
    yi0 = jnp.floor(y).astype(jnp.int32)
    zi0 = jnp.floor(z).astype(jnp.int32)
    xf, yf, zf = x - xi0, y - yi0, z - zi0

    def wrap(i):
        return jnp.mod(jnp.mod(i, period) + period, period)

    c = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c[(dx, dy, dz)] = _hash31_jnp(
                    wrap(xi0 + dx), wrap(yi0 + dy), wrap(zi0 + dz), seed)
    ux, uy, uz = _smooth(xf), _smooth(yf), _smooth(zf)
    x00 = c[(0, 0, 0)] * (1 - ux) + c[(1, 0, 0)] * ux
    x10 = c[(0, 1, 0)] * (1 - ux) + c[(1, 1, 0)] * ux
    x01 = c[(0, 0, 1)] * (1 - ux) + c[(1, 0, 1)] * ux
    x11 = c[(0, 1, 1)] * (1 - ux) + c[(1, 1, 1)] * ux
    y0 = x00 * (1 - uy) + x10 * uy
    y1 = x01 * (1 - uy) + x11 * uy
    return y0 * (1 - uz) + y1 * uz


def _fbm3_jnp(x, y, z, octaves, lacunarity, gain, period, seed):
    """fbm3_periodic (noise.c:206-221) on device (static octave count)."""
    a, v = 0.5, jnp.zeros_like(x)
    fx, fy, fz = x, y, z
    p = period
    for i in range(octaves):
        v = v + _value_noise3d_jnp(fx, fy, fz, p, seed + i) * a
        fx, fy, fz = fx * lacunarity, fy * lacunarity, fz * lacunarity
        p = int(round(p * lacunarity))
        a *= gain
    return v


def noise3d_field(pos, freq, octaves: int = 4, lacunarity: float = 2.0,
                  gain: float = 0.5, period: int = 8, seed: int = 1337,
                  size: int = 32):
    """sample_noise3d (noise.glsl:74-77) without the texture: the SAME
    normalized periodic-fBm gradient the bake stores, evaluated exactly
    at ``pos·freq`` (texture REPEAT wrap = the noise's periodicity).
    Returns (..., 3) in [-1, 1] — signed unit gradient vectors.

    pos: (..., 3); freq: the shader's frequency (texture coords per
    world unit). eps matches the bake's voxel step so the central
    difference agrees with noise_grad3d's discretization."""
    q = pos * (freq * period)                        # noise-space coords
    eps = period / size

    def f(dx, dy, dz):
        return _fbm3_jnp(q[..., 0] + dx, q[..., 1] + dy, q[..., 2] + dz,
                         octaves, lacunarity, gain, period, seed)

    gx = (f(eps, 0, 0) - f(-eps, 0, 0)) * (0.5 / eps)
    gy = (f(0, eps, 0) - f(0, -eps, 0)) * (0.5 / eps)
    gz = (f(0, 0, eps) - f(0, 0, -eps)) * (0.5 / eps)
    g = jnp.stack([gx, gy, gz], axis=-1)
    return g / jnp.maximum(
        jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-15)


def noise_glsl(p):
    """The shader's hash-based value noise (noise.glsl:5-38): the cheap
    per-pixel jitter fed into noise3d coords (combine.frag:45,
    noise.glsl:144). p: (..., 3) → (...)."""
    def hsh(q):
        q = q * 0.3183099 + jnp.array([0.1, 0.2, 0.3])
        q = (q - jnp.floor(q)) * 17.0
        v = q[..., 0] * q[..., 1] * q[..., 2] \
            * (q[..., 0] + q[..., 1] + q[..., 2])
        return v - jnp.floor(v)

    i = jnp.floor(p)
    f = p - i
    u = f * f * (3.0 - 2.0 * f)
    c = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c[(dx, dy, dz)] = hsh(i + jnp.array([dx, dy, dz],
                                                    p.dtype))
    x0 = (c[(0, 0, 0)] * (1 - u[..., 0]) + c[(1, 0, 0)] * u[..., 0])
    x1 = (c[(0, 1, 0)] * (1 - u[..., 0]) + c[(1, 1, 0)] * u[..., 0])
    x2 = (c[(0, 0, 1)] * (1 - u[..., 0]) + c[(1, 0, 1)] * u[..., 0])
    x3 = (c[(0, 1, 1)] * (1 - u[..., 0]) + c[(1, 1, 1)] * u[..., 0])
    y0 = x0 * (1 - u[..., 1]) + x1 * u[..., 1]
    y1 = x2 * (1 - u[..., 1]) + x3 * u[..., 1]
    return y0 * (1 - u[..., 2]) + y1 * u[..., 2]


def fog_cloud(pos, amp, freq, **noise_kw):
    """fog_cloud (noise.glsl:142-147): scalar fog density from the
    gradient field's x component, clamped to [0, 1]."""
    p = pos + noise_glsl(pos[..., [2, 0, 1]])[..., None]
    d = noise3d_field(p, freq, **noise_kw)[..., 0]
    return jnp.clip(d * amp, 0.0, 1.0)


def blue_noise2d(size: int = 64, key=None) -> jnp.ndarray:
    """(size, size, 3) float blue-noise (noise.c:96-148): random
    luma-weighted noise per channel, spectrally shaped by an r/r_max
    high-pass in frequency space."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lw = (0.299, 0.587, 0.114)
    chans = []
    fy = jnp.fft.fftfreq(size) * size
    fx = jnp.fft.fftfreq(size) * size
    r = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    maxr = jnp.sqrt(2.0) * (size / 2)
    gain = r / maxr
    for k, w in zip((k1, k2, k3), lw):
        v = (jax.random.uniform(k, (size, size)) * 4.0 - 1.0) / 3.0 * w
        spec = jnp.fft.fft2(v) * gain
        chans.append(jnp.real(jnp.fft.ifft2(spec)))
    return jnp.stack(chans, -1)


def blue_noise_luma(size: int = 64, key=None) -> jnp.ndarray:
    """Single-channel grain for the combine pass (normalized ~[0,1])."""
    n = blue_noise2d(size, key).sum(-1)
    n = (n - n.min()) / jnp.maximum(n.max() - n.min(), 1e-9)
    return n
