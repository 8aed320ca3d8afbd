"""TPU tile rasterizer (replaces the GL/Metal/WebGPU draw path,
render-*.c + models_render model.c:742-1086).

Architecture (not a port — there is no hardware rasterizer to call):

1. **Vertex stage** (XLA/MXU): world → clip transforms are batched
   matmuls outside this module; the rasterizer takes screen-space
   triangles.
2. **Binning** (XLA sort): each triangle emits (tile, tri) pairs for the
   tiles its bbox overlaps (capped span); pairs are sorted by tile and
   regrouped into a dense (n_tiles, MAX_PER_TILE) list. Triangles whose
   bbox exceeds the span cap go to a small "big triangle" list that every
   tile also walks — few, but they'd otherwise need unbounded fan-out.
3. **Raster kernel** (Pallas): one program per 8×128 pixel tile (lane
   aligned); walks its triangle list, evaluates edge functions on the
   pixel lattice, z-tests, and writes a deferred G-buffer: depth, tri id,
   perspective-correct barycentrics. Shading happens in a separate fused
   elementwise pass over the G-buffer (render/shade.py) — keeping the
   raster inner loop lean is what makes the 16 Gpix/s budget reachable.

Depth convention: NDC z in [-1, 1], smaller = closer (GL style, matching
mat4_perspective). Background depth = +inf, tri id = -1.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
MAX_PER_TILE = 256
MAX_SPAN_X = 8       # bbox span cap in tiles (beyond → big-tri list)
MAX_SPAN_Y = 8
MAX_BIG_TRIS = 64


class GBuffer(NamedTuple):
    depth: jnp.ndarray    # (H, W) f32, +inf background
    tri_id: jnp.ndarray   # (H, W) i32, -1 background
    bary: jnp.ndarray     # (H, W, 2) perspective-correct b0, b1


def project_to_screen(clip: jnp.ndarray, width: int, height: int):
    """Clip-space (V, 4) → screen x/y (V,), ndc z (V,), 1/w (V,).

    y is flipped so pixel (0,0) is top-left (image convention)."""
    w = clip[..., 3]
    iw = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :3] * iw[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    return sx, sy, ndc[..., 2], iw


def assemble_tri_records(sx, sy, z, iw, faces, valid_mask=None):
    """Build the packed (T, 12) per-triangle record the kernel consumes:
    [x0,y0,x1,y1,x2,y2,z0,z1,z2,iw0,iw1,iw2]. Also returns per-tri
    validity (area > 0 i.e. front-facing CCW, on-screen w>0, caller
    mask)."""
    v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
    rec = jnp.stack([
        sx[v0], sy[v0], sx[v1], sy[v1], sx[v2], sy[v2],
        z[v0], z[v1], z[v2], iw[v0], iw[v1], iw[v2],
    ], axis=-1)
    area = (sx[v1] - sx[v0]) * (sy[v2] - sy[v0]) \
        - (sy[v1] - sy[v0]) * (sx[v2] - sx[v0])
    # w>0 for all corners (no near-plane clipping in v1: crossing tris drop)
    ok = (area > 1e-8) & (iw[v0] > 0) & (iw[v1] > 0) & (iw[v2] > 0)
    # z within [-1, 1] loosely
    zmax = jnp.maximum(jnp.maximum(z[v0], z[v1]), z[v2])
    zmin = jnp.minimum(jnp.minimum(z[v0], z[v1]), z[v2])
    ok = ok & (zmin <= 1.0) & (zmax >= -1.0)
    if valid_mask is not None:
        ok = ok & valid_mask
    return rec, ok


def bin_triangles(rec, ok, width: int, height: int):
    """Sort-based binning → (tile_list (n_tiles, MAX_PER_TILE) i32,
    tile_count (n_tiles,) i32, big_list (MAX_BIG_TRIS,) i32, big_count).
    """
    ntx = pl.cdiv(width, TILE_W)
    nty = pl.cdiv(height, TILE_H)
    n_tiles = ntx * nty
    T = rec.shape[0]

    xs = rec[:, 0:6:2]
    ys = rec[:, 1:6:2]
    x0 = jnp.clip(jnp.floor(xs.min(1) / TILE_W).astype(jnp.int32), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor(xs.max(1) / TILE_W).astype(jnp.int32), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor(ys.min(1) / TILE_H).astype(jnp.int32), 0, nty - 1)
    y1 = jnp.clip(jnp.floor(ys.max(1) / TILE_H).astype(jnp.int32), 0, nty - 1)
    # offscreen?
    off = (xs.max(1) < 0) | (xs.min(1) >= width) | (ys.max(1) < 0) | (ys.min(1) >= height)
    ok = ok & ~off

    spanx = x1 - x0 + 1
    spany = y1 - y0 + 1
    big = ok & ((spanx > MAX_SPAN_X) | (spany > MAX_SPAN_Y))
    small = ok & ~big

    # pair expansion (T, MAX_SPAN_Y, MAX_SPAN_X)
    dy = jnp.arange(MAX_SPAN_Y)
    dx = jnp.arange(MAX_SPAN_X)
    ty = y0[:, None, None] + dy[None, :, None]
    tx = x0[:, None, None] + dx[None, None, :]
    pair_ok = small[:, None, None] & (ty <= y1[:, None, None]) & (tx <= x1[:, None, None])
    tile_id = ty * ntx + tx
    tile_id = jnp.where(pair_ok, tile_id, n_tiles)      # sentinel sorts last
    tri_id = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None, None],
                              tile_id.shape)

    flat_tile = tile_id.reshape(-1)
    flat_tri = tri_id.reshape(-1)
    # sort by tile; stable so tri order (≈ draw order) is preserved
    order = jnp.argsort(flat_tile, stable=True)
    st = flat_tile[order]
    stri = flat_tri[order]

    starts = jnp.searchsorted(st, jnp.arange(n_tiles))
    ends = jnp.searchsorted(st, jnp.arange(n_tiles) + 1)
    counts = jnp.minimum(ends - starts, MAX_PER_TILE).astype(jnp.int32)
    gather_idx = starts[:, None] + jnp.arange(MAX_PER_TILE)[None, :]
    gather_idx = jnp.minimum(gather_idx, st.shape[0] - 1)
    tile_list = jnp.where(
        jnp.arange(MAX_PER_TILE)[None, :] < counts[:, None],
        stri[gather_idx], 0,
    ).astype(jnp.int32)

    # big-tri list
    big_idx = jnp.nonzero(big, size=MAX_BIG_TRIS, fill_value=0)[0].astype(jnp.int32)
    big_count = jnp.minimum(jnp.sum(big), MAX_BIG_TRIS).astype(jnp.int32)
    return tile_list, counts, big_idx, big_count


def _raster_tile_kernel(n_tri_rows: int, width: int, height: int,
                        count_ref, big_count_ref, list_ref, big_ref,
                        rec_ref, depth_ref, id_ref, b0_ref, b1_ref):
    ti = pl.program_id(0)
    ntx = pl.cdiv(width, TILE_W)
    tx0 = (ti % ntx) * TILE_W
    ty0 = (ti // ntx) * TILE_H

    px = (tx0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          ).astype(jnp.float32) + 0.5
    py = (ty0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          ).astype(jnp.float32) + 0.5

    def shade_tri(tri, carry):
        depth, tid, b0o, b1o = carry
        r = rec_ref[tri, :]
        x0, y0, x1, y1, x2, y2 = r[0], r[1], r[2], r[3], r[4], r[5]
        z0, z1, z2 = r[6], r[7], r[8]
        iw0, iw1, iw2 = r[9], r[10], r[11]
        # edge functions (CCW inside: e >= 0)
        e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (area > 1e-8)
        inv_area = 1.0 / jnp.where(area == 0, 1.0, area)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = 1.0 - b0 - b1
        z = b0 * z0 + b1 * z1 + b2 * z2
        win = inside & (z < depth) & (z >= -1.0) & (z <= 1.0)
        # perspective-correct barycentrics for the G-buffer
        d0 = b0 * iw0
        d1 = b1 * iw1
        d2 = b2 * iw2
        inv_s = 1.0 / jnp.maximum(d0 + d1 + d2, 1e-20)
        depth = jnp.where(win, z, depth)
        tid = jnp.where(win, tri, tid)
        b0o = jnp.where(win, d0 * inv_s, b0o)
        b1o = jnp.where(win, d1 * inv_s, b1o)
        return depth, tid, b0o, b1o

    def small_body(k, carry):
        return jax.lax.cond(
            k < count_ref[0],
            lambda c: shade_tri(list_ref[0, k], c),
            lambda c: c, carry)

    def big_body(k, carry):
        return jax.lax.cond(
            k < big_count_ref[0],
            lambda c: shade_tri(big_ref[0, k], c),
            lambda c: c, carry)

    init = (
        jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32),
        jnp.full((TILE_H, TILE_W), -1, jnp.int32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, MAX_PER_TILE, small_body, init)
    carry = jax.lax.fori_loop(0, MAX_BIG_TRIS, big_body, carry)
    depth, tid, b0o, b1o = carry
    depth_ref[:] = depth
    id_ref[:] = tid
    b0_ref[:] = b0o
    b1_ref[:] = b1o


@partial(jax.jit, static_argnums=(2, 3))
def rasterize(rec, binned, width: int, height: int) -> GBuffer:
    """Raster the binned triangles into a (H, W) G-buffer. H/W are
    padded up to tile multiples internally and cropped on return."""
    tile_list, counts, big_idx, big_count = binned
    ntx = pl.cdiv(width, TILE_W)
    nty = pl.cdiv(height, TILE_H)
    n_tiles = ntx * nty
    Hp, Wp = nty * TILE_H, ntx * TILE_W

    kern = partial(_raster_tile_kernel, rec.shape[0], width, height)
    out_shape = [
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
    ]

    def out_map(i):
        return (i // ntx, i % ntx)

    depth, tid, b0, b1 = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_PER_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MAX_BIG_TRIS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), out_map, memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(counts, big_count[None], tile_list, big_idx[None, :], rec)

    return GBuffer(depth=depth[:height, :width],
                   tri_id=tid[:height, :width],
                   bary=jnp.stack([b0[:height, :width],
                                   b1[:height, :width]], axis=-1))


def raster_scene(clip_verts, faces, width: int, height: int,
                 face_valid=None) -> GBuffer:
    """Convenience: clip-space verts (V,4) + faces (T,3) → G-buffer."""
    sx, sy, z, iw = project_to_screen(clip_verts, width, height)
    rec, ok = assemble_tri_records(sx, sy, z, iw, faces, face_valid)
    binned = bin_triangles(rec, ok, width, height)
    return rasterize(rec, binned, width, height)


# --- brute-force reference (test oracle; small scenes only) ---------------

def raster_brute(rec, ok, width: int, height: int) -> GBuffer:
    """O(T·H·W) reference rasterizer with identical semantics."""
    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5

    def per_tri(r):
        x0, y0, x1, y1, x2, y2 = r[0], r[1], r[2], r[3], r[4], r[5]
        z0, z1, z2 = r[6], r[7], r[8]
        iw0, iw1, iw2 = r[9], r[10], r[11]
        e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (area > 1e-8)
        inv_area = 1.0 / jnp.where(area == 0, 1.0, area)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = 1.0 - b0 - b1
        z = b0 * z0 + b1 * z1 + b2 * z2
        d0, d1, d2 = b0 * iw0, b1 * iw1, b2 * iw2
        inv_s = 1.0 / jnp.maximum(d0 + d1 + d2, 1e-20)
        return inside & (z >= -1) & (z <= 1), z, d0 * inv_s, d1 * inv_s

    inside, z, b0, b1 = jax.vmap(per_tri)(rec)       # (T, H, W)
    z = jnp.where(inside & ok[:, None, None], z, jnp.inf)
    best = jnp.argmin(z, axis=0)                      # (H, W)
    depth = jnp.take_along_axis(z, best[None], axis=0)[0]
    hit = jnp.isfinite(depth)
    tid = jnp.where(hit, best, -1).astype(jnp.int32)
    b0s = jnp.take_along_axis(b0, best[None], axis=0)[0]
    b1s = jnp.take_along_axis(b1, best[None], axis=0)[0]
    return GBuffer(depth=depth, tri_id=tid,
                   bary=jnp.stack([jnp.where(hit, b0s, 0.0),
                                   jnp.where(hit, b1s, 0.0)], axis=-1))