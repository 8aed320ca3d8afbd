"""PCF shadow estimator + full frame with shadow_vsm=False."""
import numpy as np
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render import shade


def test_pcf_shadow_basic():
    s = 64
    view = mx.mat4_look_at(jnp.array([0.0, 0.0, 5.0]), jnp.zeros(3),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_ortho(-2.0, 2.0, -2.0, 2.0, 0.1, 10.0)
    mvp = (proj @ view)[None]
    # occluder depth 0.2 on the left half, far 0.9 on the right
    d = jnp.where(jnp.arange(s)[None, :] < s // 2, 0.2, 0.9)
    d = jnp.broadcast_to(d, (s, s))[None]
    dists = jnp.array([100.0])
    wpos = jnp.array([[[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    vd = jnp.array([[1.0, 1.0]])
    nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (1, 2, 3))
    ldir = jnp.array([0.0, 0.0, -1.0])
    sf = np.asarray(shade.pcf_shadow(d, mvp, dists, wpos, vd, nrm, ldir))
    assert sf[0, 0] < 0.2    # occluded
    assert sf[0, 1] > 0.9    # lit


def test_full_frame_pcf():
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import RenderOptions, render_frame
    from test_render import make_cube_geom

    opts = RenderOptions(width=64, height=64, shadow_size=32,
                         film_grain=0.0, shadow_vsm=False, ssao=False)
    geom = make_cube_geom()
    eye = jnp.array([1.5, 1.2, 2.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    img = np.asarray(render_frame(opts, geom, view, proj, lights, eye))
    assert np.isfinite(img).all()
    assert img.min() >= 0 and img.max() <= 1
