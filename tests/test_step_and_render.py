"""The north-star composition: ONE jitted XLA program that advances the
sim and renders the frame (BASELINE.json: "the whole step+render composes
into one jitted XLA program"). Small shapes on CPU; the same function
scales by vmap/sharding."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.engine.step import engine_step, inputs_zero
from clap_tpu.render.camera import camera_view_proj
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import RenderOptions
from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                         build_render_tables,
                                         model_from_mesh)
from clap_tpu.render.view import make_subview
from clap_tpu.scene.primitives import cube
from clap_tpu.scene.testbed import build_testbed


@pytest.mark.slow
def test_step_and_render_one_program():
    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    t = tb.terrain
    v, n, uv, f = cube(1.0)
    models = [
        model_from_mesh(t.vx, t.norm, t.idx.reshape(-1, 3),
                        base_color=(0.3, 0.5, 0.3), with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.8, 0.5, 0.4),
                        with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.6, 0.6, 0.7),
                        with_lods=False),
        model_from_mesh(v, n, f, with_lods=False),
    ]
    ent = tb.cfg.entities
    rt = build_render_tables(models, np.asarray(ent.model_id),
                             np.asarray(ent.active))
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    opts = RenderOptions(width=128, height=96, shadow_size=64,
                         film_grain=0.0, ssao=False)

    from clap_tpu.render.pipeline import render_frame

    @jax.jit
    def step_and_render(state, inputs):
        state = engine_step(tb.cfg, state, inputs)
        eye = state.camera.pos
        q = mx.qmul(
            mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                    state.camera.yaw),
            mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]),
                                    state.camera.pitch))
        view, proj = camera_view_proj(eye, q, jnp.pi / 3, 128 / 96)
        sv = make_subview(view, proj)
        geom = assemble_scene_geometry(rt, state.mx, state.visible,
                                       sv.planes, eye,
                                       skip_culling=ent.skip_culling)
        img = render_frame(opts, geom, view, proj, lights, eye, far=100.0)
        return state, img

    st = tb.state0
    ins = inputs_zero(1)
    for _ in range(3):
        st, img = step_and_render(st, ins)
    arr = np.asarray(img)
    assert arr.shape == (96, 128, 3)
    assert np.isfinite(arr).all()
    assert arr.std() > 0.01  # something was drawn
    assert int(st.frame) == 3
