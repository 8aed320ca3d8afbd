"""Multi-camera scene state (≤4 slots, scene.h:39-59): scene.json camera
entries load, every slot tracks its target through engine_step
(scene_cameras_calc scene.c:1050-1055), both views render, and the DOM
round-trips through scene_save."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap_tpu.engine.step import engine_step, inputs_zero
from clap_tpu.scene.loader import load_scene, save_scene
from test_gltf import make_skinned_gltf

SCENE = json.dumps({
    "name": "two-cam",
    "model": [
        {"name": "hero", "gltf": "hero.gltf",
         "character": [
             {"name": "hero.0", "position": [0, 0.5, 0]},
             {"name": "hero.1", "position": [4, 0.5, 0]},
         ]},
    ],
    "camera": [
        {"pitch": -0.3, "yaw": 0.0, "dist": 6.0, "character": -1},
        {"pitch": -0.9, "yaw": 1.5, "dist": 12.0, "character": 1},
    ],
    "light": [{"direction": [-0.4, -0.8, -0.4]}],
})


def _loader(name):
    return make_skinned_gltf().encode()


@pytest.mark.slow
def test_two_camera_scene_steps_and_renders():
    scene = load_scene(SCENE, asset_loader=_loader, max_entities=8,
                       max_bodies=4)
    assert scene.state0.cameras is not None
    assert scene.state0.cameras.pitch.shape == (2,)
    np.testing.assert_allclose(np.asarray(scene.cfg.camera_char), [-1, 1])
    # active camera mirrors slot 0
    assert float(scene.state0.camera.dist) == 6.0

    step = jax.jit(lambda s, i: engine_step(scene.cfg, s, i))
    st = scene.state0
    ins = inputs_zero(2)._replace(
        motion=jnp.zeros((2, 2), jnp.float32).at[0, 0].set(1.0))
    for _ in range(30):
        st = step(st, ins)
    eyes = np.asarray(st.cameras.pos)
    assert eyes.shape == (2, 3)
    # slot 0 orbits char 0 (walking +x), slot 1 orbits char 1 at x≈4 —
    # different targets → different eyes
    assert np.linalg.norm(eyes[0] - eyes[1]) > 1.0
    c1 = np.asarray(st.phys.pos[1])
    assert np.linalg.norm(eyes[1] - c1) < 14.0
    # active camera still mirrors slot 0
    np.testing.assert_allclose(np.asarray(st.camera.pos), eyes[0])

    # render BOTH views from the live camera bank
    from clap_tpu import mathx as mx
    from clap_tpu.render.camera import camera_view_proj
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import RenderOptions, render_frame
    from clap_tpu.render.scenerender import assemble_scene_geometry
    from clap_tpu.render.view import make_subview
    from clap_tpu.scene.content import scene_render_setup

    rt, ts = scene_render_setup(scene, tex_size=8, with_lods=False)
    opts = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=False)

    imgs = []
    for c in range(2):
        q = mx.qmul(
            mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                    st.cameras.yaw[c]),
            mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]),
                                    st.cameras.pitch[c]))
        view, proj = camera_view_proj(st.cameras.pos[c], q, jnp.pi / 3, 1.0)
        sv = make_subview(view, proj)
        geom = assemble_scene_geometry(rt, st.mx, st.visible, sv.planes,
                                       st.cameras.pos[c])
        imgs.append(np.asarray(render_frame(
            opts, geom, view, proj, scene.lights, st.cameras.pos[c])))
    assert all(np.isfinite(i).all() for i in imgs)
    assert not np.allclose(imgs[0], imgs[1], atol=1e-3)


def test_camera_roundtrip_through_save():
    scene = load_scene(SCENE, asset_loader=_loader, max_entities=8,
                       max_bodies=4)
    out = json.loads(save_scene(scene))
    assert len(out["camera"]) == 2
    assert out["camera"][1]["character"] == 1
    # reload the saved document — cameras survive
    scene2 = load_scene(json.dumps(out), asset_loader=_loader,
                        max_entities=8, max_bodies=4)
    assert scene2.state0.cameras.pitch.shape == (2,)
