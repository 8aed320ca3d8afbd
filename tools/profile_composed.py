#!/usr/bin/env python
"""Phase timing for the composed step+render program (the north-star
workload): isolates sim, geometry assembly, shadow, main raster, and
post so the per-env budget is attributable. Run on TPU.

Usage: python tools/profile_composed.py [n_envs] [res]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from clap_tpu import mathx as mx
from clap_tpu.anim.system import anim_instances_init
from clap_tpu.engine.game import GameSessionState, GameWorld, game_step
from clap_tpu.engine.gamelogic import game_config_empty, game_state_init
from clap_tpu.engine.step import inputs_zero
from clap_tpu.render.camera import camera_view_proj
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import (RenderOptions, model_pass,
                                      render_frame, shadow_pass_all)
from clap_tpu.render.scenerender import (assemble_scene_geometry_batch,
                                         build_render_tables,
                                         default_edge_ids)
from clap_tpu.render.view import cascade_subviews, make_subview
from clap_tpu.scene.testbed import (build_demo_rig, build_testbed,
                                    testbed_models)

n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

n_chars = 2
tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                   max_entities=96, n_chars=n_chars, terrain_chunks=4)
sk, lib, acfg = build_demo_rig()
gcfg = game_config_empty(1, 96)._replace(
    switch_entity=jnp.array([0], jnp.int32),
    switch_valid=jnp.array([True]),
    switch_permanent=jnp.array([True]))
gw = GameWorld(scene=tb.cfg, game=gcfg, anim=acfg, anim_sk=sk, anim_lib=lib)
gs1 = GameSessionState(engine=tb.state0, game=game_state_init(1, n_chars),
                       anim=anim_instances_init(n_chars),
                       joint_mats=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                           (n_chars, 3, 1, 1)))

models = testbed_models(tb)
ent = tb.cfg.entities
edge = default_edge_ids(np.asarray(ent.active), np.asarray(ent.body_is_char))
rt = build_render_tables(models, np.asarray(ent.model_id),
                         np.asarray(ent.active), entity_edge_id=edge)
lights = lights_empty(1)
d = jnp.array([-0.4, -0.8, -0.4])
lights = lights._replace(
    direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
    color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
    is_dir=lights.is_dir.at[0].set(True),
    active=lights.active.at[0].set(True))
opts = RenderOptions(width=res, height=res, shadow_size=256, film_grain=0.0,
                     record_compact=24576)
proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)
skip = ent.skip_culling

gss = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), gs1)
ins1 = inputs_zero(n_chars)._replace(
    motion=jnp.zeros((n_chars, 2), jnp.float32).at[0, 0].set(1.0))
ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), ins1)


def views_planes(sts):
    cam = sts.camera

    def view_of(c):
        q = mx.qmul(
            mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), c.yaw),
            mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), c.pitch))
        return camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]

    views = jax.vmap(view_of)(cam)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    return views, planes


# --- phase jits -------------------------------------------------------------

@jax.jit
def f_sim(gss, ins):
    return jax.vmap(lambda s, i: game_step(gw, s, i))(gss, ins)


@jax.jit
def f_assemble(sts):
    views, planes = views_planes(sts)
    geom, axes = assemble_scene_geometry_batch(
        rt, sts.mx, sts.visible, planes, sts.camera.pos,
        skip_culling=skip)
    return geom, views


@jax.jit
def f_shadow(geom_verts, geom_fv, views):
    # per-env CSM fit + 4-cascade atlas raster (positions only)
    from clap_tpu.render.pipeline import SceneGeometry

    def one(v, fv, vw):
        g = SceneGeometry(verts=v, normals=rt.normals, faces=rt.faces,
                          face_valid=fv, base_color=rt.base_color,
                          rough_metal=rt.rough_metal, emission=rt.emission)
        casc, cd = cascade_subviews(vw, proj, lights.direction[0], 0.1,
                                    200.0)
        return shadow_pass_all(opts, g, casc.view, casc.proj)

    return jax.vmap(one)(geom_verts, geom_fv, views)


@jax.jit
def f_full(gss, ins):
    gss = jax.vmap(lambda s, i: game_step(gw, s, i))(gss, ins)
    sts = gss.engine
    views, planes = views_planes(sts)
    geom, axes = assemble_scene_geometry_batch(
        rt, sts.mx, sts.visible, planes, sts.camera.pos, skip_culling=skip)
    from clap_tpu.render.pipeline import render_frame_dynamic_batch

    imgs = render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                      lights, sts.camera.pos, far=200.0)
    return gss, jnp.mean(imgs, axis=(1, 2, 3))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:>28}: {dt:9.2f} ms  ({dt / n_envs:6.3f} ms/env)")
    return out


print(f"composed profile: {n_envs} envs @ {res}² "
      f"[{jax.default_backend()}]")
gss2 = timeit("sim (game_step)", f_sim, gss, ins)
sts = gss2.engine
geom, views = timeit("assembly (one-hot)", f_assemble, sts)
timeit("shadow (4-casc atlas/env)", f_shadow, geom.verts, geom.face_valid,
       views)
timeit("FULL step+render", f_full, gss, ins)
