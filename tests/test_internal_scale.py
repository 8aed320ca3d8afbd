"""Internal-resolution shading-rate lever (VERDICT r3 #2): bilinear
upscale correctness + the RenderOptions switch end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render import post
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import RenderOptions, render_frame

from test_render import make_cube_geom


def test_upsample_bilinear_matches_resize():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (24, 32, 3)), jnp.float32)
    for f in (2, 3, 4):
        got = np.asarray(post.upsample_bilinear(img, 24 * f, 32 * f))
        want = np.asarray(jax.image.resize(
            img, (24 * f, 32 * f, 3), "bilinear"))
        np.testing.assert_allclose(got, want, atol=1e-5)


def _frame(opts):
    geom = make_cube_geom()
    eye = jnp.array([1.5, 1.2, 2.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 128 / 96, 0.1, 50.0)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    return np.asarray(render_frame(opts, geom, view, proj, lights, eye))


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def test_internal_scale_renders_and_tracks_reference():
    base = dict(width=128, height=96, shadow_size=64, film_grain=0.0)
    full = _frame(RenderOptions(**base))
    half = _frame(RenderOptions(internal_scale=2, **base))
    assert half.shape == full.shape
    assert np.isfinite(half).all()
    assert half.min() >= 0 and half.max() <= 1
    # the half-res frame is a fair approximation of the full frame
    # (same scene; tiny 128px target makes this a loose but real bar)
    p = psnr(half, full)
    assert p > 20.0, p
    # and it is NOT the full-res frame (the lever actually engaged)
    assert not np.allclose(half, full, atol=1e-4)
