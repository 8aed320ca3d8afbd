"""PNG codec + texture sampling tests."""
import numpy as np
import jax.numpy as jnp

from clap_tpu.utils.png import decode_png, encode_png
from clap_tpu.render.texture import sample_bilinear, sample_nearest, upload_texture


def test_png_roundtrip_rgba():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
    back = decode_png(encode_png(img))
    np.testing.assert_array_equal(back, img)


def test_png_rgb_and_gray():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    out = decode_png(encode_png(rgb))
    np.testing.assert_array_equal(out[..., :3], rgb)
    assert (out[..., 3] == 255).all()
    gray = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    np.testing.assert_array_equal(out[..., 0], gray)


def test_png_float_input():
    img = np.linspace(0, 1, 48).reshape(4, 4, 3).astype(np.float32)
    out = decode_png(encode_png(img))
    np.testing.assert_allclose(out[..., :3] / 255.0, img, atol=1 / 255)


def test_bilinear_sampling():
    # 2x2 checker: bilinear at the center is the average
    tex = jnp.asarray([[[1.0], [0.0]], [[0.0], [1.0]]])
    c = sample_bilinear(tex, jnp.array([[0.5, 0.5]]), wrap=False)
    assert abs(float(c[0, 0]) - 0.5) < 1e-6
    # exact texel centers
    c2 = sample_bilinear(tex, jnp.array([[0.25, 0.25]]), wrap=False)
    assert abs(float(c2[0, 0]) - 1.0) < 1e-6


def test_wrap_repeat():
    tex = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 4, 1))
    a = sample_nearest(tex, jnp.array([[0.1, 0.5]]))
    b = sample_nearest(tex, jnp.array([[1.1, 0.5]]))  # wraps
    assert float(a[0, 0]) == float(b[0, 0])


def test_textured_frame():
    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import RenderOptions, SceneGeometry, render_frame
    from clap_tpu.scene.primitives import quad

    v, n, uv, f = quad(2.0, 2.0)
    v = v - np.array([1, 1, 0], np.float32)
    geom = SceneGeometry(
        verts=jnp.asarray(v), normals=jnp.asarray(n), faces=jnp.asarray(f),
        face_valid=jnp.ones((2,), bool), base_color=jnp.ones((4, 3)),
        rough_metal=jnp.full((4, 2), 0.5), emission=jnp.zeros((4, 3)),
        uv=jnp.asarray(uv))
    # half red / half green texture
    tex = np.zeros((2, 2, 4), np.uint8)
    tex[:, 0] = (255, 0, 0, 255)
    tex[:, 1] = (0, 255, 0, 255)
    opts = RenderOptions(width=64, height=64, shadow_size=32, ssao=False,
                         bloom=False, edge_aa=False, film_grain=0.0,
                         fog_far=1e5, fog_near=1e4)
    eye = jnp.array([0.0, 0.0, 2.5])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 2, 1.0, 0.1, 10.0)
    lights = lights_empty(1)
    lights = lights._replace(
        direction=lights.direction.at[0].set(jnp.array([0.0, 0.0, -1.0])),
        color=lights.color.at[0].set(jnp.ones(3) * 3),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    img = np.asarray(render_frame(
        opts, geom, view, proj, lights, eye,
        base_texture=upload_texture(tex)))
    # quad spans NDC ±0.4 → pixels ~[19, 45]; sample inside each half
    left = img[32, 26]
    right = img[32, 38]
    assert left[0] > left[1]
    assert right[1] > right[0]
