"""3D-noise-modulated fog (VERDICT r3 missing #4): the analytic noise
field vs the baked volume, the combine fog tint (combine.frag:35-48) and
the material fog blend (lighting.glsl:209-213)."""
import numpy as np
import pytest
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.ops.noise import (fog_cloud, noise3d_field, noise_glsl,
                                noise_grad3d)
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import RenderOptions, render_frame

from test_render import make_cube_geom


def test_analytic_field_matches_bake():
    """noise3d_field evaluates the SAME gradient field noise_grad3d
    bakes: at voxel centers the two agree to RGBA8 quantization."""
    size, period = 16, 8
    vol = noise_grad3d(size=size, period_units=float(period))
    # voxel (x, y, z) holds the gradient at noise coords (x,y,z)·step;
    # feed noise3d_field the world pos that maps there: q = pos·freq·p
    idx = np.array([[1, 2, 3], [7, 0, 5], [4, 9, 11], [15, 15, 15]])
    step = period / size
    freq = 0.05
    pos = jnp.asarray(idx * step / (freq * period), jnp.float32)
    got = np.asarray(noise3d_field(pos, freq, size=size, period=period))
    want = vol[idx[:, 2], idx[:, 1], idx[:, 0], :3] / 255.0 * 2.0 - 1.0
    # bake grid is [z][y][x] (noise.c:234-238 loop order)
    np.testing.assert_allclose(got, want, atol=2.5 / 255)


def test_noise_glsl_range():
    p = jnp.asarray(np.random.default_rng(0).uniform(-20, 20, (256, 3)),
                    jnp.float32)
    n = np.asarray(noise_glsl(p))
    assert n.shape == (256,)
    assert (n >= 0).all() and (n <= 1).all()
    assert n.std() > 0.05                       # actually varies


def test_fog_cloud_density_range():
    pos = jnp.asarray(np.random.default_rng(1).uniform(-30, 30, (128, 3)),
                      jnp.float32)
    d = np.asarray(fog_cloud(pos, 2.0, 0.05))
    assert (d >= 0).all() and (d <= 1).all()
    assert d.max() > 0.1                        # amp actually bites


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


@pytest.mark.slow
def test_fog_noise_modulates_combine():
    """fog_noise darkens the fog tint per pixel (radial_fog_color):
    background (pure fog) pixels change; image stays finite/in-range."""
    base = dict(width=128, height=96, shadow_size=64, film_grain=0.0,
                fog_near=0.5, fog_far=6.0)   # fog bites at cube distance
    f0 = _frame(RenderOptions(**base))
    f1 = _frame(RenderOptions(fog_noise=True, **base))
    assert np.isfinite(f1).all() and f1.min() >= 0 and f1.max() <= 1
    assert not np.allclose(f0, f1, atol=1e-5)
    # modulation only DARKENS the fog tint (fog_color·(1−n), n ≥ 0)
    assert (f1 <= f0 + 1e-4).all()


def test_material_fog_blends_toward_ambient():
    """use_3d_fog: lit surface blends toward the ambient fog color and
    specular attenuates — the cube's lit pixels change; background
    (no-hit fog pixels) must NOT."""
    base = dict(width=128, height=96, shadow_size=64, film_grain=0.0)
    f0 = _frame(RenderOptions(**base))
    f1 = _frame(RenderOptions(material_fog=True, fog_3d_amp=3.0, **base))
    assert np.isfinite(f1).all()
    assert not np.allclose(f0, f1, atol=1e-5)
    # background corner identical (fog density only applies to surfaces)
    np.testing.assert_allclose(f0[2, 2], f1[2, 2], atol=1e-6)
