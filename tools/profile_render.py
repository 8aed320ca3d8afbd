#!/usr/bin/env python
"""Phase timing for the batched render (32 x 256^2) on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from clap_tpu import mathx as mx
from clap_tpu.render.lights import lights_empty, light_grid
from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                      render_frame, shadow_pass_all,
                                      model_pass, clip_transform)
from clap_tpu.render.raster import (assemble_tri_records, bin_triangles,
                                    project_to_screen, rasterize)
from clap_tpu.render.view import cascade_subviews
from clap_tpu.scene.terrain import terrain_init_square_landscape

n_envs, res = 32, 256
t = terrain_init_square_landscape(11, -16.0, 0.0, -16.0, 32.0, 48)
V = t.vx.shape[0]
geom = SceneGeometry(
    verts=jnp.asarray(t.vx), normals=jnp.asarray(t.norm),
    faces=jnp.asarray(t.idx.reshape(-1, 3)),
    face_valid=jnp.ones((t.idx.size // 3,), bool),
    base_color=jnp.full((V, 3), 0.45),
    rough_metal=jnp.tile(jnp.array([[0.8, 0.0]]), (V, 1)),
    emission=jnp.zeros((V, 3)),
)
print("tris:", t.idx.size // 3, "verts:", V)
opts = RenderOptions(width=res, height=res, shadow_size=256,
                     film_grain=0.0, ssao=False)
lights = lights_empty(1)
d = jnp.array([-0.4, -0.8, -0.4])
lights = lights._replace(
    direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
    color=lights.color.at[0].set(jnp.ones(3)),
    is_dir=lights.is_dir.at[0].set(True),
    active=lights.active.at[0].set(True))
ang = jnp.linspace(0, 2 * jnp.pi, n_envs, endpoint=False)
eyes = jnp.stack([12 * jnp.cos(ang), jnp.full((n_envs,), 9.0),
                  12 * jnp.sin(ang)], -1)
views = jax.vmap(lambda e: mx.mat4_look_at(
    e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.3f} ms ({n_envs/dt:,.0f} fps)")
    return out


full = jax.jit(jax.vmap(lambda vw, e: render_frame(opts, geom, vw, proj,
                                                   lights, e, far=100.0)))
timeit("render_frame full", full, views, eyes)

from clap_tpu.render.pipeline import render_frame_batch
fb = jax.jit(lambda vw, e: render_frame_batch(opts, geom, vw, proj,
                                              lights, e, far=100.0))
timeit("render_frame_batch (shared shadow)", fb, views, eyes)

shad = jax.jit(jax.vmap(lambda vw: shadow_pass_all(
    opts, geom, *[x for x in cascade_subviews(vw, proj, lights.direction[0], 0.1, 100.0)[0][:2]])))
# cascade_subviews returns (subviews, dists); subviews has .view/.proj
def shadow_only(vw):
    casc, dists = cascade_subviews(vw, proj, lights.direction[0], 0.1, 100.0)
    return shadow_pass_all(opts, geom, casc.view, casc.proj)
timeit("shadow_pass_all (4 casc atlas)", jax.jit(jax.vmap(shadow_only)), views)


def model_only(vw, e):
    return model_pass(opts, geom, vw, proj, lights, e)[0]  # hdr
timeit("model_pass (raster+shade)", jax.jit(jax.vmap(model_only)), views, eyes)


def raster_only(vw):
    clip = clip_transform(geom.verts, vw, proj)
    sx, sy, z, iw = project_to_screen(clip, res, res)
    rec, ok = assemble_tri_records(sx, sy, z, iw, geom.faces, geom.face_valid)
    binned = bin_triangles(rec, ok, res, res)
    return rasterize(rec, binned, res, res).depth
timeit("camera raster (bin+kernel)", jax.jit(jax.vmap(raster_only)), views)


def bin_only(vw):
    clip = clip_transform(geom.verts, vw, proj)
    sx, sy, z, iw = project_to_screen(clip, res, res)
    rec, ok = assemble_tri_records(sx, sy, z, iw, geom.faces, geom.face_valid)
    return bin_triangles(rec, ok, res, res)[0]
timeit("binning only (sort)", jax.jit(jax.vmap(bin_only)), views)

lg = jax.jit(jax.vmap(lambda vw: light_grid(lights, vw, proj, res, res)))
timeit("light_grid", lg, views)
