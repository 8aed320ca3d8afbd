"""Noise bake + LUT tests."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu.ops.noise import (blue_noise2d, blue_noise_luma, fbm3_periodic,
                                hash31, noise_grad3d, value_noise3d_periodic)
from clap_tpu.render.lut import LUT_PRESETS, apply_lut, bake_lut, lut_find


def test_hash31_matches_c_formula():
    # scalar transliteration
    def ref(x, y, z, seed):
        h = (x * 374761393 + y * 668265263 + z * 362437
             + seed * 2246822519) & 0xFFFFFFFF
        h = ((h ^ (h >> 13)) * 1274126177) & 0xFFFFFFFF
        h = h ^ (h >> 16)
        return h / 4294967296.0

    for args in [(0, 0, 0, 1), (5, 7, 9, 1337), (123, 456, 789, 42)]:
        assert abs(float(hash31(*args)) - ref(*args)) < 1e-12


def test_value_noise_periodic_tiles():
    v0 = value_noise3d_periodic(np.float64(0.5), np.float64(1.5),
                                np.float64(2.5), 8, 7)
    v1 = value_noise3d_periodic(np.float64(8.5), np.float64(1.5),
                                np.float64(2.5), 8, 7)
    assert abs(float(v0) - float(v1)) < 1e-12
    assert 0.0 <= float(v0) <= 1.0


def test_noise_grad3d_bake():
    vol = noise_grad3d(size=8, octaves=2, period_units=4.0, seed=3)
    assert vol.shape == (8, 8, 8, 4)
    # unit gradients pack to non-degenerate bytes
    g = vol[..., :3].astype(np.float64) / 255 * 2 - 1
    ln = np.linalg.norm(g, axis=-1)
    assert (np.abs(ln - 1.0) < 0.05).mean() > 0.9


def test_blue_noise_spectrum():
    n = np.asarray(blue_noise2d(64, jax.random.PRNGKey(1)).sum(-1))
    # blue noise: low-frequency energy suppressed
    spec = np.abs(np.fft.fft2(n))
    low = spec[:4, :4].sum() - spec[0, 0]
    high = spec[24:40, 24:40].sum()
    assert high > low * 3
    lum = np.asarray(blue_noise_luma(32))
    assert lum.min() >= 0 and lum.max() <= 1


def test_lut_identity():
    p = lut_find("identity")
    vol = bake_lut(p, 16)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    out = np.asarray(apply_lut(c, vol))
    np.testing.assert_allclose(out, np.asarray(c), atol=0.01)


def test_all_presets_valid():
    assert len(LUT_PRESETS) == 14  # LUT_MAX presets (lut.h:8-24)
    c = jnp.asarray(np.random.default_rng(1).random((4, 4, 3)).astype(np.float32))
    for p in LUT_PRESETS:
        vol = bake_lut(p, 8)
        out = np.asarray(apply_lut(c, vol))
        assert out.shape == (4, 4, 3)
        assert np.isfinite(out).all()
        assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def test_teal_orange_pushes_channels():
    vol = bake_lut(lut_find("teal orange"), 16)
    grey = jnp.full((1, 1, 3), 0.5)
    out = np.asarray(apply_lut(grey, vol))[0, 0]
    assert out[0] > out[1] * 0.9  # reds lifted vs green
