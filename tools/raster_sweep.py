#!/usr/bin/env python
"""Raster micro-benchmark: sweep tile size on the 720p 100k-tri frame
and on the 64×256² batch, isolating the pallas kernel + binning from
the rest of the pipeline. Run on TPU.

Usage: python tools/raster_sweep.py [--batch]
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
from clap_tpu.render.raster import (assemble_tri_records, bin_triangles,
                                    bin_stats, cluster_faces,
                                    project_to_screen, rasterize)
from clap_tpu.scene.terrain import terrain_init_square_landscape


def big_scene(target_tris=100_000):
    """Terrain + enough instanced detail to pass target_tris."""
    t = terrain_init_square_landscape(3, -32.0, 0.0, -32.0, 64.0, 128)
    verts = [np.asarray(t.vx)]
    faces = [np.asarray(t.idx.reshape(-1, 3))]
    ntri = faces[0].shape[0]
    voff = verts[0].shape[0]
    # scatter rock-like icosahedra until the budget is met
    rng = np.random.default_rng(0)
    from clap_tpu.scene.primitives import cube

    cv, cn, _cu, cf = cube(1.0)
    cf = np.asarray(cf).reshape(-1, 3)
    cv = np.asarray(cv)
    while ntri < target_tris:
        s = 0.3 + rng.random() * 1.2
        p = np.array([rng.uniform(-30, 30), 0.0, rng.uniform(-30, 30)])
        from clap_tpu.scene.terrain import terrain_height_np

        p[1] = terrain_height_np(t, p[0], p[2]) + s * 0.4
        verts.append(cv * s + p)
        faces.append(cf + voff)
        voff += cv.shape[0]
        ntri += cf.shape[0]
    v = np.concatenate(verts).astype(np.float32)
    f = np.concatenate(faces).astype(np.int32)
    f = cluster_faces(v, f)[0]
    return jnp.asarray(v), jnp.asarray(f)


def main():
    W, H = 1280, 720
    verts, faces = big_scene()
    print(f"scene: {faces.shape[0]} tris, {verts.shape[0]} verts")
    eye = jnp.array([0.0, 18.0, 28.0])
    view = mx.mat4_look_at(eye, jnp.array([0.0, 2.0, 0.0]),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, W / H, 0.1, 200.0)
    clip = jnp.einsum("ij,vj->vi", proj @ view, jnp.concatenate(
        [verts, jnp.ones_like(verts[:, :1])], -1))
    valid = jnp.ones((faces.shape[0],), bool)

    for th, tw in ((32, 256), (16, 256), (8, 256), (32, 128), (16, 128)):
        @jax.jit
        def frame(clip):
            sx, sy, z, iw = project_to_screen(clip, W, H)
            rec, ok = assemble_tri_records(sx, sy, z, iw, faces, valid)
            binned = bin_triangles(rec, ok, W, H, tile_h=th, tile_w=tw)
            gb = rasterize(rec, binned, W, H, th, tw)
            return gb.depth.sum(), binned

        (out, binned) = frame(clip)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out, _ = frame(clip)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        st = bin_stats(binned, W, H)
        print(f"tile {th:3d}x{tw:3d}: {dt:8.2f} ms   {st}")


if __name__ == "__main__":
    main()
