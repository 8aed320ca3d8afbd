"""MSAA render options (clap.c:453-465 shadow_msaa/model_msaa →
pipeline rebuilds; pipeline-builder.c:245-308): model_msaa supersamples
the whole 3D frame and box-resolves, shadow_msaa rasters the cascade
atlas at f× and average-pools the VSM moments (the multisample
resolve — moments are linear in coverage)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import RenderOptions, render_frame
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
    # tilt the cube so its silhouette aliases
    q = np.asarray(mx.quat_from_axis_angle(
        jnp.array([0.0, 1.0, 0.0]), jnp.float32(0.6)))
    mxs[1] = np.asarray(mx.mat4_compose_trs(
        jnp.array([0.0, 1.0, 0.0]), jnp.asarray(q), jnp.float32(1.0)))
    eye = jnp.array([4.0, 3.5, 5.0])
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    view = mx.mat4_look_at(eye, jnp.array([0.0, 0.8, 0.0]),
                           jnp.array([0.0, 1.0, 0.0]))
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


def _render(opts, scene):
    geom, view, proj, lights, eye = scene
    return np.asarray(jax.jit(lambda g: render_frame(
        opts, g, view, proj, lights, eye, far=60.0))(geom))


@pytest.mark.slow
def test_model_msaa_resolves_and_smooths():
    scene = _scene()
    base = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=False, edge_aa=False,
                         outline_strength=0.0)
    import dataclasses

    i1 = _render(base, scene)
    i2 = _render(dataclasses.replace(base, model_msaa=2), scene)
    assert i2.shape == i1.shape == (64, 64, 3)
    assert np.isfinite(i2).all()
    # same image content (close in the mean) ...
    assert abs(i2.mean() - i1.mean()) < 0.02
    # ... but smoother silhouettes: total variation strictly drops
    tv = lambda im: np.abs(np.diff(im, axis=0)).sum() \
        + np.abs(np.diff(im, axis=1)).sum()       # noqa: E731
    assert tv(i2) < tv(i1), (tv(i2), tv(i1))


def test_shadow_msaa_moments_shape_and_quality():
    scene = _scene()
    import dataclasses

    base = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=False, edge_aa=False,
                         outline_strength=0.0)
    i1 = _render(base, scene)
    i2 = _render(dataclasses.replace(base, shadow_msaa=2), scene)
    # same size out; shadows still present and close overall
    assert i2.shape == i1.shape
    d = np.abs(i2 - i1)
    assert d.mean() < 0.02, d.mean()
    assert d.max() > 0.0      # the resolve actually changed samples
