#!/usr/bin/env python
"""Raster sweep 3: tile size × per-tile cap for the BATCHED composed
workload (the real north-star shape): 16 envs × 256², per-env dynamic
testbed scene through assembly + near-clip, vmapped rasterize only.

The round-2 sweep compared tile sizes at FIXED cap (32×256 won); this
one shrinks cap with the tile so the per-step record-DMA cost scales
down too — the open question from ROUND_NOTES "2-level binning".

Usage: python tools/raster_sweep3.py
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
from clap_tpu.render.camera import camera_view_proj
from clap_tpu.render.pipeline import clip_transform
from clap_tpu.render.raster import (bin_triangles, clip_near_records,
                                    rasterize)
from clap_tpu.render.scenerender import (assemble_scene_geometry_batch,
                                         build_render_tables,
                                         default_edge_ids)
from clap_tpu.render.view import make_subview
from clap_tpu.scene.testbed import build_testbed, testbed_models

n_envs, W, H = 16, 256, 256
tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                   max_entities=96, n_chars=2, terrain_chunks=4)
models = testbed_models(tb)
ent = tb.cfg.entities
edge = default_edge_ids(np.asarray(ent.active), np.asarray(ent.body_is_char))
rt = build_render_tables(models, np.asarray(ent.model_id),
                         np.asarray(ent.active), entity_edge_id=edge)
proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)

st = tb.state0
c = st.camera
q = mx.qmul(mx.quat_from_axis_angle(jnp.array([0., 1, 0]), c.yaw),
            mx.quat_from_axis_angle(jnp.array([1., 0, 0]), c.pitch))
view = camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]
sv = make_subview(view, proj)

B = n_envs
bmx = jnp.broadcast_to(st.mx, (B, *st.mx.shape))
bvis = jnp.broadcast_to(st.visible, (B, *st.visible.shape))
bplanes = jnp.broadcast_to(sv.planes, (B, *sv.planes.shape))
beyes = jnp.broadcast_to(c.pos, (B, 3))
geom, axes = assemble_scene_geometry_batch(
    rt, bmx, bvis, bplanes, beyes, skip_culling=ent.skip_culling)
views = jnp.broadcast_to(view, (B, 4, 4))


def run(th, tw, cap):
    @jax.jit
    def f(verts, fv, vws):
        def one(v, m, vw):
            clip = clip_transform(v, vw, proj)
            rec, ok, csrc, cbary = clip_near_records(clip, rt.faces, W, H, m)
            binned = bin_triangles(rec, ok, W, H, tile_h=th, tile_w=tw,
                                   cap=cap)
            gb = rasterize(rec, binned, W, H, tile_h=th, tile_w=tw)
            return gb.depth.sum() + gb.tri_id.sum()
        return jax.vmap(one)(verts, fv, vws)

    out = f(geom.verts, geom.face_valid, views)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(geom.verts, geom.face_valid, views)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: {dt:8.2f} ms "
          f"({dt / n_envs:6.3f} ms/env)", flush=True)


for th, tw, cap in [
    (32, 256, 4096),   # current default
    (32, 256, 2048),
    (16, 256, 4096),
    (16, 256, 2048),
    (8, 256, 2048),
    (8, 256, 1024),
    (8, 128, 1024),
    (16, 128, 2048),
]:
    run(th, tw, cap)
