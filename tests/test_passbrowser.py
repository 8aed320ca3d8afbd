"""Per-pass pipeline debug browser (pipeline-debug.c:268 analogue):
render_frame_debug taps every pass's intermediate, and the browser
composites a labelled thumbnail grid."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.passbrowser import (compose_pass_browser,
                                         render_frame_debug)
from clap_tpu.render.pipeline import RenderOptions
from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                         build_render_tables,
                                         model_from_mesh)
from clap_tpu.render.view import make_subview
from clap_tpu.scene.primitives import cube


def _scene():
    v, n, uv, f = cube(1.0)
    flat_v = np.array([[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]],
                      np.float32)
    flat_n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    flat_f = np.array([[0, 2, 1], [0, 3, 2]], np.uint32)
    models = [model_from_mesh(flat_v, flat_n, flat_f, with_lods=False),
              model_from_mesh(v, n, f, base_color=(0.8, 0.4, 0.3),
                              with_lods=False)]
    rt = build_render_tables(models, np.array([0, 1], np.int32),
                             np.ones(2, bool))
    mxs = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    mxs[1, :3, 3] = [0.0, 1.0, 0.0]
    eye = jnp.array([5.0, 5.0, 7.0])
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    planes = make_subview(view, proj).planes
    geom = assemble_scene_geometry(rt, jnp.asarray(mxs),
                                   jnp.ones(2, bool), planes, eye)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    return geom, view, proj, lights, eye


def test_render_frame_debug_taps():
    geom, view, proj, lights, eye = _scene()
    opts = RenderOptions(width=96, height=96, shadow_size=64,
                         film_grain=0.0, ssao=True, edge_aa=True,
                         bloom=True)
    img, taps, counts = render_frame_debug(opts, geom, view, proj,
                                           lights, eye, far=60.0)
    assert img.shape == (96, 96, 3)
    for name in ("shadow_atlas", "lighting_hdr", "emission",
                 "view_normals", "depth", "edges", "smaa_weights",
                 "ssao", "bloom", "combine"):
        assert name in taps, name
    # taps carry the real pass payloads
    assert taps["lighting_hdr"].shape == (96, 96, 3)
    assert taps["ssao"].shape[:2] == (96, 96)
    assert np.isfinite(np.asarray(taps["lighting_hdr"])).all()
    # combine tap IS the final image
    np.testing.assert_allclose(np.asarray(taps["combine"]),
                               np.asarray(img))
    assert int(counts["faces_valid"]) > 0
    assert int(counts["hit_pixels"]) > 0


def test_debug_taps_do_not_change_image():
    geom, view, proj, lights, eye = _scene()
    opts = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=False)
    from clap_tpu.render.pipeline import render_frame

    # eager-vs-eager: the tap stores add no math, so images are
    # bit-identical (a jitted comparison would only measure XLA fusion
    # fp reassociation, not the taps)
    base = render_frame(opts, geom, view, proj, lights, eye, far=60.0)
    img, _, _ = render_frame_debug(opts, geom, view, proj, lights, eye,
                                   far=60.0)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(base))


def test_compose_pass_browser_grid():
    geom, view, proj, lights, eye = _scene()
    opts = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=True)
    _, taps, counts = render_frame_debug(opts, geom, view, proj, lights,
                                         eye, far=60.0)
    mosaic = compose_pass_browser(taps, counts, thumb_h=40, thumb_w=52,
                                  cols=3)
    assert mosaic.ndim == 3 and mosaic.shape[-1] == 3
    assert mosaic.shape[0] > 80 and mosaic.shape[1] > 150
    assert np.isfinite(mosaic).all()
    assert 0.0 <= mosaic.min() and mosaic.max() <= 1.0
    assert mosaic.std() > 0.01        # thumbnails actually drawn
