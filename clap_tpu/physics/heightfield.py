"""Batched heightfield queries on device (reference: core/terrain.c:336-379).

The terrain trimesh in the reference is fed to ODE's collision space; on
TPU the regular-grid structure makes an explicit trimesh unnecessary:
every query resolves to ONE gather of a packed per-cell record (the four
corner heights) from a flat table, followed by elementwise math — the
gather-count is what dominates the batched narrowphase, so the packing
matters more than the math.

Heightfield layout: ``H[x, z]`` (nr_v, nr_v) float32, matching the host
generator (scene/terrain.py). ``cells`` is the flattened
((nr_v-1)², 4) [h00, h10, h01, h11] corner table. All query functions
broadcast over arbitrary batch shapes and are jit/vmap-friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Heightfield(NamedTuple):
    """Static per-scene terrain data (device constants)."""

    heights: jnp.ndarray       # (nr_v, nr_v) [x][z]
    cells: jnp.ndarray         # ((nr_v-1)², 4) packed corner heights
    normals: jnp.ndarray       # (nr_v, nr_v, 3) grid normals
    origin: jnp.ndarray        # (2,) [x0, z0]
    side: jnp.ndarray          # () scalar


def _pack_cells(heights: jnp.ndarray) -> jnp.ndarray:
    h00 = heights[:-1, :-1]
    h10 = heights[1:, :-1]
    h01 = heights[:-1, 1:]
    h11 = heights[1:, 1:]
    return jnp.stack([h00, h10, h01, h11], axis=-1).reshape(-1, 4)


def make_heightfield(heights, normals, origin, side) -> Heightfield:
    heights = jnp.asarray(heights, jnp.float32)
    return Heightfield(
        heights=heights,
        cells=_pack_cells(heights),
        normals=jnp.asarray(normals, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        side=jnp.asarray(side, jnp.float32),
    )


def heightfield_from_terrain(t) -> Heightfield:
    """Upload a host Terrain (scene/terrain.py) as device constants."""
    return make_heightfield(t.heights, t.normals_grid,
                            jnp.array([t.x, t.z]), t.side)


def mxu_rows_2(table, i0, batch_shape):
    """Select rows i0 and i0+1 of ``table`` (n, m) for a batch of indices
    via ONE one-hot matmul on the MXU.

    TPU gathers of tiny rows cost ~0.5 ms per 184k rows inside a jit;
    the equivalent one-hot f32 matmul runs ~4× faster AND is exact
    (each output element is a sum with exactly one nonzero product, so
    HIGHEST-precision f32 matmul reproduces the table bits). Returns
    (rows_i0, rows_i0p1) of shape batch_shape + (m,)."""
    n = table.shape[0]
    flat = i0.reshape(-1)                                  # (B,)
    ar = jnp.arange(n, dtype=jnp.int32)[None, :]
    oh0 = (flat[:, None] == ar).astype(table.dtype)        # (B, n)
    oh1 = (flat[:, None] + 1 == ar).astype(table.dtype)
    oh = jnp.concatenate([oh0, oh1], axis=0)               # (2B, n)
    rows = jax.lax.dot(oh, table, precision=jax.lax.Precision.HIGHEST)
    B = flat.shape[0]
    m = table.shape[1]
    return (rows[:B].reshape(*batch_shape, m),
            rows[B:].reshape(*batch_shape, m))


def _col_pick_2(rows, j0, n):
    """Elementwise one-hot pick of columns j0 and j0+1 from (..., n)."""
    ar = jnp.arange(n, dtype=jnp.int32)
    shape = (1,) * (rows.ndim - 1) + (n,)
    ar = ar.reshape(shape)
    j = j0[..., None]
    c0 = jnp.sum(jnp.where(j == ar, rows, 0.0), axis=-1)
    c1 = jnp.sum(jnp.where(j + 1 == ar, rows, 0.0), axis=-1)
    return c0, c1


def _cell_query(hf: Heightfield, x, z):
    """Shared cell lookup via one-hot MXU selection (no gathers).

    Returns (h00, h10, h01, h11, xoff, zoff, inside, square)."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    tx = x - hf.origin[0]
    tz = z - hf.origin[1]
    inside = (tx >= 0) & (tx <= hf.side) & (tz >= 0) & (tz <= hf.side)
    gx = jnp.floor(tx / square).astype(jnp.int32)
    gz = jnp.floor(tz / square).astype(jnp.int32)
    xoff = (tx - square * gx) / square
    zoff = (tz - square * gz) / square
    gx = jnp.clip(gx, 0, n - 2)
    gz = jnp.clip(gz, 0, n - 2)
    rows0, rows1 = mxu_rows_2(hf.heights, gx, gx.shape)    # H[gx], H[gx+1]
    h00, h01 = _col_pick_2(rows0, gz, n)
    h10, h11 = _col_pick_2(rows1, gz, n)
    return h00, h10, h01, h11, xoff, zoff, inside, square


def hf_height(hf: Heightfield, x, z):
    """terrain_height (terrain.c:336-379): triangle-exact barycentric
    interpolation, 0 outside the terrain bounds."""
    h00, h10, h01, h11, xoff, zoff, inside, _ = _cell_query(hf, x, z)
    h_lower = h00 + (h10 - h00) * xoff + (h01 - h00) * zoff
    h_upper = h10 + (h11 - h10) * zoff + (h01 - h11) * (1 - xoff)
    h = jnp.where(xoff <= 1 - zoff, h_lower, h_upper)
    return jnp.where(inside, h, 0.0)


def hf_face_plane(hf: Heightfield, x, z):
    """Plane of the exact triangle under (x, z): returns (normal (...,3),
    height (...,), inside (...)). The point (x, height, z) lies on the
    plane (hf_height is barycentric on the same triangle)."""
    h00, h10, h01, h11, xoff, zoff, inside, square = _cell_query(hf, x, z)
    lower = xoff <= 1 - zoff
    h = jnp.where(lower,
                  h00 + (h10 - h00) * xoff + (h01 - h00) * zoff,
                  h10 + (h11 - h10) * zoff + (h01 - h11) * (1 - xoff))
    nx = jnp.where(lower, -(h10 - h00), -(h11 - h01))
    nz = jnp.where(lower, -(h01 - h00), -(h11 - h10))
    ny = jnp.broadcast_to(square, nx.shape)
    inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
    normal = jnp.stack([nx * inv, ny * inv, nz * inv], axis=-1)
    return normal, h, inside


SWEEP_PATCH = 8    # corner patch for swept queries (covers ±3 cells of
                   # travel: per-frame deltas up to ~3·cell − r)
CONTACT_PATCH = 4  # per-body patch (samples within ±radius < ±1.5 cells)


def hf_patch(hf: Heightfield, x, z, p: int):
    """Extract the p×p corner-height patch around the cell of scalar
    (x, z): heights[gx0:gx0+p, gz0:gz0+p] as ONE dynamic_slice (one
    gather row per query under vmap, vs one per sample).

    Returns (patch (p, p), gx0, gz0). Sample cells outside the patch are
    clamped to its edge by the evaluators — the same degradation as
    querying beyond the terrain bounds."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    gx = jnp.floor((x - hf.origin[0]) / square).astype(jnp.int32)
    gz = jnp.floor((z - hf.origin[1]) / square).astype(jnp.int32)
    gx0 = jnp.clip(gx - (p // 2 - 1), 0, n - p)
    gz0 = jnp.clip(gz - (p // 2 - 1), 0, n - p)
    # double one-hot MXU extraction (exact f32 selection). A vmapped
    # dynamic_slice here lowers to a windowed gather that measured ~50 ms
    # at 4096 envs × 9 bodies; two matmuls run in ~0.2 ms.
    ar = jnp.arange(n, dtype=jnp.int32)[None, :]
    kk = jnp.arange(p, dtype=jnp.int32)[:, None]
    ox = (gx0 + kk == ar).astype(hf.heights.dtype)          # (p, n)
    rows = jax.lax.dot(ox, hf.heights,
                       precision=jax.lax.Precision.HIGHEST)  # (p, n)
    oz = (gz0 + kk == ar).astype(hf.heights.dtype)          # (p, n)
    patch = jax.lax.dot(rows, oz.T,
                        precision=jax.lax.Precision.HIGHEST)  # (p, p)
    return patch, gx0, gz0


def hf_face_plane_patch(hf: Heightfield, patch, gx0, gz0, x, z):
    """hf_face_plane evaluated from a pre-extracted patch: corner picks
    are tiny one-hot reductions over the in-register patch (pure fused
    vector math — no gathers, no (B, n) matmul intermediates).

    x/z may carry extra batch dims relative to the (p, p) patch."""
    n = hf.heights.shape[0]
    p = patch.shape[-1]
    square = hf.side / (n - 1)
    tx = x - hf.origin[0]
    tz = z - hf.origin[1]
    inside = (tx >= 0) & (tx <= hf.side) & (tz >= 0) & (tz <= hf.side)
    gx = jnp.floor(tx / square).astype(jnp.int32)
    gz = jnp.floor(tz / square).astype(jnp.int32)
    xoff = (tx - square * gx) / square
    zoff = (tz - square * gz) / square
    lx = jnp.clip(gx - gx0, 0, p - 2)
    lz = jnp.clip(gz - gz0, 0, p - 2)
    ar = jnp.arange(p, dtype=jnp.int32)
    # row pair (…, p): rows lx and lx+1 of the patch
    rx = (lx[..., None] == ar).astype(patch.dtype)
    row0 = jnp.sum(rx[..., :, None] * patch, axis=-2)
    row1 = jnp.sum(jnp.roll(rx, 1, axis=-1)[..., :, None] * patch, axis=-2)
    cz0 = (lz[..., None] == ar).astype(patch.dtype)
    cz1 = jnp.roll(cz0, 1, axis=-1)
    h00 = jnp.sum(row0 * cz0, -1)
    h01 = jnp.sum(row0 * cz1, -1)
    h10 = jnp.sum(row1 * cz0, -1)
    h11 = jnp.sum(row1 * cz1, -1)
    lower = xoff <= 1 - zoff
    h = jnp.where(lower,
                  h00 + (h10 - h00) * xoff + (h01 - h00) * zoff,
                  h10 + (h11 - h10) * zoff + (h01 - h11) * (1 - xoff))
    nx = jnp.where(lower, -(h10 - h00), -(h11 - h01))
    nz = jnp.where(lower, -(h01 - h00), -(h11 - h10))
    ny = jnp.broadcast_to(square, nx.shape)
    inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
    normal = jnp.stack([nx * inv, ny * inv, nz * inv], axis=-1)
    return normal, h, inside


def hf_normal(hf: Heightfield, x, z):
    """terrain_normal (terrain.c:316-324): grid-cell normal (not
    interpolated — matches the reference's gameplay query)."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    gx = jnp.clip(jnp.floor((x - hf.origin[0]) / square).astype(jnp.int32), 0, n - 1)
    gz = jnp.clip(jnp.floor((z - hf.origin[1]) / square).astype(jnp.int32), 0, n - 1)
    return hf.normals[gx, gz]


def hf_face_normal(hf: Heightfield, x, z):
    """Exact normal of the triangle under (x, z) — what ODE's trimesh
    collider reports for contacts."""
    return hf_face_plane(hf, x, z)[0]
