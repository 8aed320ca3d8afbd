#!/usr/bin/env python
"""Raster sweep round 2: BIG tiles + raised caps (the round-1 sweep
showed per-grid-step fixed cost dominates: 32×256 beat 16×256 2×).
Covers the three real workloads: 720p/100k-tri full view, 256² main
view, and the 4-cascade shadow atlas (band mode, depth-only kernel).

Usage: python tools/raster_sweep2.py
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
from clap_tpu.render.raster import (assemble_tri_records, bin_stats,
                                    bin_triangles, cluster_faces,
                                    project_to_screen, rasterize,
                                    rasterize_depth)
from clap_tpu.scene.terrain import terrain_init_square_landscape
from raster_sweep import big_scene


def time_frame(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def sweep_720p():
    W, H = 1280, 720
    verts, faces = big_scene()
    print(f"--- 720p, {faces.shape[0]} tris")
    eye = jnp.array([0.0, 18.0, 28.0])
    view = mx.mat4_look_at(eye, jnp.array([0.0, 2.0, 0.0]),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, W / H, 0.1, 200.0)
    clip = jnp.einsum("ij,vj->vi", proj @ view, jnp.concatenate(
        [verts, jnp.ones_like(verts[:, :1])], -1))
    valid = jnp.ones((faces.shape[0],), bool)

    for th, tw, cap in ((32, 256, 1024), (32, 256, 4096),
                        (64, 256, 4096), (128, 256, 8192),
                        (64, 512, 4096), (128, 512, 8192)):
        if tw > W:
            continue

        @jax.jit
        def frame(clip):
            sx, sy, z, iw = project_to_screen(clip, W, H)
            rec, ok = assemble_tri_records(sx, sy, z, iw, faces, valid)
            binned = bin_triangles(rec, ok, W, H, tile_h=th, tile_w=tw,
                                   cap=cap)
            gb = rasterize(rec, binned, W, H, th, tw)
            return gb.depth.sum(), binned

        try:
            out, binned = frame(clip)
            dt = time_frame(lambda c: frame(c)[0], clip)
            st = bin_stats(binned, W, H)
            print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: {dt:8.2f} ms  "
                  f"tiles {st['n_tiles']:4d} at_cap {st['tiles_at_cap']}")
        except Exception as e:
            print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: FAIL {str(e)[:90]}")


def sweep_256():
    W = H = 256
    t = terrain_init_square_landscape(42, -32.0, 0.0, -32.0, 64.0, 128)
    v = np.asarray(t.vx, np.float32)
    f = cluster_faces(v, np.asarray(t.idx.reshape(-1, 3)))[0]
    verts, faces = jnp.asarray(v), jnp.asarray(f)
    print(f"--- 256², {faces.shape[0]} tris")
    eye = jnp.array([0.0, 14.0, 22.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)
    clip = jnp.einsum("ij,vj->vi", proj @ view, jnp.concatenate(
        [verts, jnp.ones_like(verts[:, :1])], -1))
    valid = jnp.ones((faces.shape[0],), bool)
    B = 64
    clips = jnp.broadcast_to(clip, (B, *clip.shape))

    for th, tw, cap in ((32, 256, 4096), (64, 256, 4096),
                        (128, 256, 8192), (256, 256, 16384)):
        @jax.jit
        def frame(clips):
            def one(clip):
                sx, sy, z, iw = project_to_screen(clip, W, H)
                rec, ok = assemble_tri_records(sx, sy, z, iw, faces, valid)
                binned = bin_triangles(rec, ok, W, H, tile_h=th,
                                       tile_w=tw, cap=cap)
                gb = rasterize(rec, binned, W, H, th, tw)
                return gb.depth.sum()
            return jax.vmap(one)(clips)

        try:
            dt = time_frame(frame, clips)
            print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: {dt:8.2f} ms "
                  f"({dt / B * 1e3:6.0f} µs/env)")
        except Exception as e:
            print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: FAIL {str(e)[:90]}")


def sweep_shadow():
    s = 256
    n_casc = 4
    t = terrain_init_square_landscape(42, -32.0, 0.0, -32.0, 64.0, 128)
    v = np.asarray(t.vx, np.float32)
    f = cluster_faces(v, np.asarray(t.idx.reshape(-1, 3)))[0]
    verts, faces0 = jnp.asarray(v), jnp.asarray(f)
    T = faces0.shape[0]
    print(f"--- shadow atlas {n_casc}×{s}², {T} tris/casc")
    # one ortho view per cascade (synthetic fits)
    B = 64

    from clap_tpu.render.view import bounds_light_subview

    sv, _cd = bounds_light_subview(jnp.array([-32.0, -8.0, -32.0]),
                                   jnp.array([32.0, 12.0, 32.0]),
                                   jnp.array([-0.4, -0.8, -0.4]) / 1.02)
    V = verts.shape[0]
    clips = []
    for c in range(n_casc):
        clip = jnp.einsum("ij,vj->vi", sv.proj[c % sv.proj.shape[0]]
                          @ sv.view[c % sv.view.shape[0]],
                          jnp.concatenate(
                              [verts, jnp.ones_like(verts[:, :1])], -1))
        clips.append(clip)

    for th, tw, cap in ((32, 256, 1024), (64, 256, 4096),
                        (128, 256, 8192), (256, 256, 8192)):
        band_tiles = s // th

        @jax.jit
        def shadow(clip_all):
            def one(clip4):
                sxs, sys_, zs, iws = [], [], [], []
                for c in range(n_casc):
                    sx, sy, z, iw = project_to_screen(clip4[c], s, s)
                    sxs.append(sx)
                    sys_.append(sy + c * s)
                    zs.append(z)
                    iws.append(iw)
                sx = jnp.concatenate(sxs)
                sy = jnp.concatenate(sys_)
                z = jnp.concatenate(zs)
                iw = jnp.concatenate(iws)
                faces = jnp.concatenate(
                    [faces0 + c * V for c in range(n_casc)])
                valid = jnp.ones((T * n_casc,), bool)
                rec, ok = assemble_tri_records(sx, sy, z, iw, faces,
                                               valid, two_sided=True)
                band = jnp.repeat(jnp.arange(n_casc, dtype=jnp.int32), T)
                binned = bin_triangles(rec, ok, s, n_casc * s,
                                       band_id=band,
                                       band_tiles=band_tiles,
                                       tile_h=th, tile_w=tw, cap=cap)
                return rasterize_depth(rec, binned, s, n_casc * s,
                                       th, tw).sum()
            return jax.vmap(one)(clip_all)

        clip_all = jnp.broadcast_to(jnp.stack(clips),
                                    (B, n_casc, V, 4))
        try:
            dt = time_frame(shadow, clip_all)
            print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: {dt:8.2f} ms "
                  f"({dt / B * 1e3:6.0f} µs/env)")
        except Exception as e:
            print(f"tile {th:3d}x{tw:3d} cap {cap:5d}: FAIL {str(e)[:90]}")


if __name__ == "__main__":
    sweep_256()
    sweep_shadow()
    sweep_720p()
