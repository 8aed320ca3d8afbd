"""Kernel chunk-size parity: the tile kernels walk their lists in
``chunk``-record steps (TRI_CHUNK default; rasterize(chunk=) overrides).
Chunk size is a pure scheduling knob — winners must not change.

The r5 sweep measured per-chunk loop overhead (~0.35 µs: slab read,
while bookkeeping, early-out reduce) dominating the lattice math, so
the production default walks 32-record chunks; this pins that the
chunk/sub-column restructuring (tile_subcols) stays exact vs the
brute-force oracle at every size."""
import jax.numpy as jnp
import numpy as np
import pytest

from clap_tpu import mathx as mx
from clap_tpu.render.raster import (assemble_tri_records, bin_triangles,
                                    project_to_screen, raster_brute,
                                    rasterize)
from clap_tpu.scene.terrain import terrain_init_square_landscape


@pytest.mark.parametrize("chunk", [8, 16, 32])
def test_rasterize_chunk_parity(chunk):
    t = terrain_init_square_landscape(5, -8.0, 0.0, -8.0, 16.0, 16)
    verts = jnp.asarray(t.vx)
    faces = jnp.asarray(t.idx.reshape(-1, 3))
    eye = jnp.array([6.0, 6.0, 6.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    clip = jnp.einsum("ij,vj->vi", proj @ view, jnp.concatenate(
        [verts, jnp.ones_like(verts[:, :1])], -1))
    # 256-wide target: tile_subcols(256) == 2, so the sub-column walk
    # and the 128-lane slab writes are exercised (128² stays sub == 1)
    W = H = 256
    sx, sy, z, iw = project_to_screen(clip, W, H)
    rec, ok = assemble_tri_records(sx, sy, z, iw, faces,
                                   jnp.ones((faces.shape[0],), bool))
    binned = bin_triangles(rec, ok, W, H)
    ref = raster_brute(rec, ok, W, H)
    gb = rasterize(rec, binned, W, H, None, None, 8, chunk)
    tid = np.asarray(gb.tri_id)
    tid_ref = np.asarray(ref.tri_id)
    same = tid == tid_ref
    # fp-associativity slivers on shared edges only
    assert same.mean() > 0.995
    hit = same & (tid >= 0)
    assert np.allclose(np.asarray(gb.depth)[hit],
                       np.asarray(ref.depth)[hit], atol=1e-4)
