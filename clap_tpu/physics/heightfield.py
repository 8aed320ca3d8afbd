"""Batched heightfield queries on device (reference: core/terrain.c:336-379).

The terrain trimesh in the reference is fed to ODE's collision space; on
TPU the regular-grid structure makes an explicit trimesh unnecessary for
ground queries — height/normal lookups are two gathers and a select. The
capsule-vs-terrain narrowphase (physics/capsule.py) builds on these.

Heightfield layout: ``H[x, z]`` (nr_v, nr_v) float32, matching the host
generator (scene/terrain.py). All query functions broadcast over leading
batch axes and are jit/vmap-friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Heightfield(NamedTuple):
    """Static per-scene terrain data (device constants)."""

    heights: jnp.ndarray       # (nr_v, nr_v) [x][z]
    normals: jnp.ndarray       # (nr_v, nr_v, 3) grid normals
    origin: jnp.ndarray        # (2,) [x0, z0]
    side: jnp.ndarray          # () scalar
    # nr_vert is heights.shape[0] (static)


def heightfield_from_terrain(t) -> Heightfield:
    """Upload a host Terrain (scene/terrain.py) as device constants."""
    return Heightfield(
        heights=jnp.asarray(t.heights, dtype=jnp.float32),
        normals=jnp.asarray(t.normals_grid, dtype=jnp.float32),
        origin=jnp.array([t.x, t.z], dtype=jnp.float32),
        side=jnp.asarray(t.side, dtype=jnp.float32),
    )


def hf_height(hf: Heightfield, x, z):
    """terrain_height (terrain.c:336-379): triangle-exact barycentric
    interpolation, 0 outside the terrain bounds."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    tx = x - hf.origin[0]
    tz = z - hf.origin[1]
    gx = jnp.floor(tx / square).astype(jnp.int32)
    gz = jnp.floor(tz / square).astype(jnp.int32)
    xoff = (tx - square * gx) / square
    zoff = (tz - square * gz) / square
    oob = (tx < 0) | (tx > hf.side) | (tz < 0) | (tz > hf.side)
    gx = jnp.clip(gx, 0, n - 2)
    gz = jnp.clip(gz, 0, n - 2)
    h00 = hf.heights[gx, gz]
    h10 = hf.heights[gx + 1, gz]
    h01 = hf.heights[gx, gz + 1]
    h11 = hf.heights[gx + 1, gz + 1]
    h_lower = h00 + (h10 - h00) * xoff + (h01 - h00) * zoff
    h_upper = h10 + (h11 - h10) * zoff + (h01 - h11) * (1 - xoff)
    h = jnp.where(xoff <= 1 - zoff, h_lower, h_upper)
    return jnp.where(oob, 0.0, h)


def hf_normal(hf: Heightfield, x, z):
    """terrain_normal (terrain.c:316-324): grid-cell normal (not
    interpolated — matches the reference's gameplay query)."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    gx = jnp.clip(jnp.floor((x - hf.origin[0]) / square).astype(jnp.int32), 0, n - 1)
    gz = jnp.clip(jnp.floor((z - hf.origin[1]) / square).astype(jnp.int32), 0, n - 1)
    return hf.normals[gx, gz]


def hf_face_plane(hf: Heightfield, x, z):
    """Plane of the exact triangle under (x, z): returns (normal (...,3),
    height (...,)). The point (x, height, z) lies on the plane (hf_height
    is barycentric on the same triangle), so together they define it.
    Positions outside the field report an invalid mask."""
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
    h00 = hf.heights[gx, gz]
    h10 = hf.heights[gx + 1, gz]
    h01 = hf.heights[gx, gz + 1]
    h11 = hf.heights[gx + 1, gz + 1]
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


def hf_face_normal(hf: Heightfield, x, z):
    """Exact normal of the triangle under (x, z) — what ODE's trimesh
    collider reports for contacts. Used by the contact solver."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    tx = x - hf.origin[0]
    tz = z - hf.origin[1]
    gx = jnp.floor(tx / square).astype(jnp.int32)
    gz = jnp.floor(tz / square).astype(jnp.int32)
    xoff = (tx - square * gx) / square
    zoff = (tz - square * gz) / square
    gx = jnp.clip(gx, 0, n - 2)
    gz = jnp.clip(gz, 0, n - 2)
    h00 = hf.heights[gx, gz]
    h10 = hf.heights[gx + 1, gz]
    h01 = hf.heights[gx, gz + 1]
    h11 = hf.heights[gx + 1, gz + 1]
    s = square
    lower = xoff <= 1 - zoff
    # lower tri edges: (s,h10-h00,0), (0,h01-h00,s); upper: (0,h11-h10,s), (-s,h01-h11,0)
    ex = jnp.where(lower, h10 - h00, h11 - h10)
    ez = jnp.where(lower, h01 - h00, h01 - h11)
    # normal = cross(edge_x, edge_z) for lower, cross(edge_z, edge_x2)… both
    # reduce to (-dy/dx, 1, -dy/dz) scaled:
    nx = jnp.where(lower, -(h10 - h00), -(h11 - h01))
    nz = jnp.where(lower, -(h01 - h00), -(h11 - h10))
    v = jnp.stack([nx, jnp.broadcast_to(s, nx.shape), nz], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
