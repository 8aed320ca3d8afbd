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
