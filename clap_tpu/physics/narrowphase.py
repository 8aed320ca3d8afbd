"""Batched narrowphase: capsule/sphere/ray vs heightfield + triangle soup.

Replaces ODE's dSpaceCollide/dCollide narrowphase (physics.c near_callback,
deps/ode) with fixed-shape contact generation:

- Heightfield contacts test the capsule against the 2·K·K triangles of a
  K×K grid-cell neighborhood around the capsule axis (the regular grid IS
  the broadphase — no hash spaces needed).
- Static trimesh contacts test against the scene's triangle soup with a
  validity mask (scene meshes are small; a tile broadphase can be added
  in front without changing the contract).

Contact convention: ``normal`` points from the obstacle toward the body
(the push-out direction — the same orientation the reference flips ODE
normals into for its sweep, physics.c:619-629). ``depth > 0`` means
penetration. All functions broadcast over leading batch axes via vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .heightfield import Heightfield, hf_face_plane
from .shapes import capsule_triangle_contact, ray_triangle


class StaticWorld(NamedTuple):
    """Per-scene static collision geometry (shared across all envs)."""

    hf: Heightfield
    tris: jnp.ndarray       # (T, 3, 3) world-space static triangles
    tri_valid: jnp.ndarray  # (T,) bool
    tri_entity: jnp.ndarray = None  # (T,) int32 owning entity per triangle
    hf_entity: jnp.ndarray = None   # () int32 terrain's entity id


def make_world(hf: Heightfield, tris=None, tri_valid=None,
               tri_entity=None, hf_entity: int = 0) -> StaticWorld:
    """Build a StaticWorld; pads the trimesh soup so T >= 1.

    tri_entity/hf_entity map collision geometry back to scene entities —
    what lets the controller report WHICH entity the character stands on
    (the hook the reference's whole switch mechanic hangs off,
    character.c:490-496)."""
    if tris is None or tris.shape[0] == 0:
        tris = jnp.zeros((1, 3, 3), jnp.float32)
        tri_valid = jnp.zeros((1,), bool)
        tri_entity = jnp.full((1,), -1, jnp.int32)
    else:
        tris = jnp.asarray(tris, jnp.float32)
        if tri_valid is None:
            tri_valid = jnp.ones((tris.shape[0],), bool)
        if tri_entity is None:
            tri_entity = jnp.zeros((tris.shape[0],), jnp.int32)
        else:
            tri_entity = jnp.asarray(tri_entity, jnp.int32)
    return StaticWorld(hf=hf, tris=tris, tri_valid=tri_valid,
                       tri_entity=tri_entity,
                       hf_entity=jnp.int32(hf_entity))


class Contacts(NamedTuple):
    """Fixed-capacity contact set."""

    depth: jnp.ndarray    # (C,) penetration depth (r - dist); <=0 → no contact
    normal: jnp.ndarray   # (C, 3) obstacle → body
    point: jnp.ndarray    # (C, 3) on obstacle surface
    valid: jnp.ndarray    # (C,) bool


HF_NEIGH = 2  # heightfield cells on each side of the capsule cell


def _hf_local_tris(hf: Heightfield, x, z, neigh: int = HF_NEIGH):
    """Gather the 2·(2n+1)² triangles around grid cell of (x, z).

    Returns (T_local, 3, 3) vertices and a validity mask (cells outside
    the field are masked)."""
    n = hf.heights.shape[0]
    square = hf.side / (n - 1)
    gx = jnp.floor((x - hf.origin[0]) / square).astype(jnp.int32)
    gz = jnp.floor((z - hf.origin[1]) / square).astype(jnp.int32)
    offs = jnp.arange(-neigh, neigh + 1)
    cgx = gx + offs[:, None]              # (k, 1)
    cgz = gz + offs[None, :]              # (1, k)
    k = 2 * neigh + 1
    cgx = jnp.broadcast_to(cgx, (k, k)).reshape(-1)
    cgz = jnp.broadcast_to(cgz, (k, k)).reshape(-1)
    valid = (cgx >= 0) & (cgx < n - 1) & (cgz >= 0) & (cgz < n - 1)
    cx = jnp.clip(cgx, 0, n - 2)
    cz = jnp.clip(cgz, 0, n - 2)

    x0 = hf.origin[0] + cx * square
    z0 = hf.origin[1] + cz * square
    h00 = hf.heights[cx, cz]
    h10 = hf.heights[cx + 1, cz]
    h01 = hf.heights[cx, cz + 1]
    h11 = hf.heights[cx + 1, cz + 1]

    p00 = jnp.stack([x0, h00, z0], -1)
    p10 = jnp.stack([x0 + square, h10, z0], -1)
    p01 = jnp.stack([x0, h01, z0 + square], -1)
    p11 = jnp.stack([x0 + square, h11, z0 + square], -1)

    # triangles wound CCW seen from above (normal +y):
    # lower: p00, p01, p10; upper: p10, p01, p11
    t_lo = jnp.stack([p00, p01, p10], axis=-2)
    t_hi = jnp.stack([p10, p01, p11], axis=-2)
    tris = jnp.concatenate([t_lo, t_hi], axis=0)     # (2k², 3, 3)
    vmask = jnp.concatenate([valid, valid], axis=0)
    return tris, vmask


# sample offsets (units of capsule radius) for analytic heightfield
# contacts: center + 4 cardinal + 4 diagonal points around the capsule axis
_HF_SAMPLE_OFFS = (
    (0.0, 0.0),
    (1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0),
    (0.707, 0.707), (0.707, -0.707), (-0.707, 0.707), (-0.707, -0.707),
)


def hf_capsule_contacts(hf: Heightfield, p_bot, p_top, r, n_samples: int = 9,
                        patch=None, two_ended: bool = False):
    """Analytic capsule-vs-heightfield contacts.

    Instead of testing the 2·K² local grid triangles exactly (what ODE's
    trimesh collider effectively does, and what we did first — 50 segment
    -triangle tests per probe), sample the exact face plane under 9
    points around the capsule axis and generate one plane contact each.
    On a C1 heightfield this matches the triangle-exact contact to the
    sampling resolution at ~6× less work and with TPU-friendly gather
    shapes. Triangle-exact tests remain available for static trimeshes
    and in tests (_hf_local_tris + capsule_triangle_contact).

    ``patch``: optional pre-extracted (patch, gx0, gz0) from hf_patch —
    ONE memory access serves all samples (and, for sweeps, all probes).
    """
    from .heightfield import (CONTACT_PATCH, hf_face_plane_patch, hf_patch)

    offs = jnp.asarray(_HF_SAMPLE_OFFS[:n_samples], dtype=jnp.float32)  # (S, 2)
    if two_ended:
        # tumbling capsules: sample around both segment ends AND the
        # midpoint, so a lying capsule rests on two supports and a long
        # capsule across a ridge still finds the center contact (the
        # builder-admitted r2 midline gap). Spheres and upright capsules
        # keep the single-ended contact set.
        ends = jnp.stack([p_bot, 0.5 * (p_bot + p_top), p_top])  # (3, 3)
        sx = (ends[:, None, 0] + offs[None, :, 0] * r).reshape(-1)
        sz = (ends[:, None, 2] + offs[None, :, 1] * r).reshape(-1)
        seg_pt = jnp.repeat(ends, n_samples, axis=0)       # (3S, 3)
    else:
        sx = p_bot[0] + offs[:, 0] * r
        sz = p_bot[2] + offs[:, 1] * r
        seg_pt = None
    if patch is None:
        mid = 0.5 * (p_bot + p_top)
        # a lying capsule's samples span its length: wider patch
        patch = hf_patch(hf, mid[0], mid[2],
                         8 if two_ended else CONTACT_PATCH)
    normal, h, inside = hf_face_plane_patch(hf, *patch, sx, sz)
    plane_pt = jnp.stack([sx, h, sz], axis=-1)
    if seg_pt is None:
        # closest capsule-segment endpoint along -normal (vertical
        # capsules: bottom for up-facing planes)
        seg_pt = jnp.where(normal[:, 1:2] >= 0, p_bot[None, :],
                           p_top[None, :])
    dist = jnp.sum(normal * (seg_pt - plane_pt), axis=-1)
    depth = jnp.where(inside, r - dist, -jnp.inf)
    point = seg_pt - normal * dist[:, None]
    return depth, normal, point, inside & (depth > 0)


def capsule_world_contacts(world: StaticWorld, p_bot, p_top, r,
                           n_samples: int = 9, patch=None,
                           two_ended: bool = False) -> Contacts:
    """All static-world contacts of one capsule (segment p_bot→p_top,
    radius r): analytic heightfield planes + exact trimesh triangles.

    Output capacity: n_samples (×3 when two_ended) heightfield slots +
    T trimesh slots.
    """
    hd, hn, hp, hv = hf_capsule_contacts(world.hf, p_bot, p_top, r,
                                         n_samples, patch, two_ended)

    depth, normal, point = jax.vmap(
        lambda t: capsule_triangle_contact(p_bot, p_top, r, t[0], t[1], t[2])
    )(world.tris)
    depth = jnp.where(world.tri_valid, depth, -jnp.inf)
    valid = world.tri_valid & (depth > 0)

    return Contacts(
        depth=jnp.concatenate([hd, depth]),
        normal=jnp.concatenate([hn, normal], axis=0),
        point=jnp.concatenate([hp, point], axis=0),
        valid=jnp.concatenate([hv, valid]),
    )


def sphere_world_contacts(world: StaticWorld, center, r,
                          neigh: int = HF_NEIGH) -> Contacts:
    """Sphere = zero-length capsule."""
    return capsule_world_contacts(world, center, center, r, neigh)


def deepest_contact(c: Contacts):
    """(depth, normal, point, any_valid) of the deepest valid contact."""
    d = jnp.where(c.valid, c.depth, -jnp.inf)
    i = jnp.argmax(d)
    return c.depth[i], c.normal[i], c.point[i], c.valid[i]


# ---------------------------------------------------------------------------
# ray casts (replaces __phys_ray_cast, physics.c:473-540)
# ---------------------------------------------------------------------------

def raycast_down(world: StaticWorld, origin, max_dist):
    """Vertical downward ray — the ground_collide query
    (physics.c:718-727 casts (0,-1,0)). Heightfield handled analytically;
    trimesh via Möller–Trumbore with backface culling.

    Returns (dist, normal, hit, entity); dist = max_dist and entity = -1
    when nothing hit. ``entity`` is the scene entity of the surface the
    ray hit (tri_entity / hf_entity) — the ground-contact hook the
    reference's switch mechanic is built on (character.c:490-496).
    """
    x, y, z = origin[0], origin[1], origin[2]
    h = jnp.squeeze(_hf_height_and_normal(world.hf, x, z)[0])
    hf_dist = y - h
    hf_ok = (hf_dist >= 0) & (hf_dist <= max_dist) & _hf_inside(world.hf, x, z)
    hf_n = _hf_height_and_normal(world.hf, x, z)[1]

    direc = jnp.array([0.0, -1.0, 0.0], dtype=jnp.float32)
    t, hit = jax.vmap(
        lambda tri: ray_triangle(origin, direc, tri[0], tri[1], tri[2])
    )(world.tris)
    t = jnp.where(hit & world.tri_valid & (t <= max_dist), t, jnp.inf)
    tri_dist = jnp.min(t)
    # winner attributes via first-match mask (no argmin+gather)
    first = (t == tri_dist)
    first = first & (jnp.cumsum(first.astype(jnp.int32)) == 1)
    fw = first.astype(jnp.float32)
    tri = jnp.einsum("t,tij->ij", fw, world.tris)
    tn = jnp.cross(tri[1] - tri[0], tri[2] - tri[0])
    tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
    tri_ent = jnp.sum(fw * world.tri_entity.astype(jnp.float32)
                      ).astype(jnp.int32)

    hf_d = jnp.where(hf_ok, hf_dist, jnp.inf)
    use_hf = hf_d <= tri_dist
    dist = jnp.minimum(jnp.minimum(hf_d, tri_dist), max_dist)
    hit_any = jnp.isfinite(jnp.minimum(hf_d, tri_dist))
    normal = jnp.where(use_hf, hf_n, tn)
    hf_ent = world.hf_entity if world.hf_entity is not None else jnp.int32(0)
    entity = jnp.where(hit_any,
                       jnp.where(use_hf, hf_ent, tri_ent),
                       jnp.int32(-1))
    return jnp.where(hit_any, dist, max_dist), normal, hit_any, entity


def raycast(world: StaticWorld, origin, direction, max_dist, n_march: int = 16):
    """General ray vs world. Trimesh exact; heightfield by fixed-step
    marching + one bisection refine (camera occlusion quality — the
    reference uses it only for camera rays and probes, camera.c:93-117).

    Returns (dist, hit_any).
    """
    direc = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)

    t, hit = jax.vmap(
        lambda tri: ray_triangle(origin, direc, tri[0], tri[1], tri[2])
    )(world.tris)
    t = jnp.where(hit & world.tri_valid, t, jnp.inf)
    tri_dist = jnp.min(t)

    # heightfield marching: sample y - h along the ray
    s = jnp.linspace(0.0, 1.0, n_march) * max_dist
    pts = origin[None, :] + s[:, None] * direc[None, :]
    above = pts[:, 1] - _hf_heights_batch(world.hf, pts[:, 0], pts[:, 2])
    inside = _hf_inside(world.hf, pts[:, 0], pts[:, 2])
    below = (above < 0) & inside
    first = jnp.argmax(below)  # first True; 0 if none
    any_below = jnp.any(below)
    lo = s[jnp.maximum(first - 1, 0)]
    hi = s[first]

    def bisect(lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        p = origin + mid * direc
        under = p[1] - _hf_heights_batch(world.hf, p[0], p[2]) < 0
        return jnp.where(under, lo, mid), jnp.where(under, mid, hi)

    # unrolled (8 fixed halvings): fuses instead of while-looping
    lo, hi = lo, hi
    for _ in range(8):
        lo, hi = bisect((lo, hi))
    hf_dist = jnp.where(any_below, hi, jnp.inf)

    dist = jnp.minimum(tri_dist, hf_dist)
    hit_any = jnp.isfinite(dist)
    return jnp.where(hit_any, dist, max_dist), hit_any


# --- heightfield helpers (local to avoid circular import noise) ------------

def _hf_inside(hf: Heightfield, x, z):
    tx = x - hf.origin[0]
    tz = z - hf.origin[1]
    return (tx >= 0) & (tx <= hf.side) & (tz >= 0) & (tz <= hf.side)


def _hf_heights_batch(hf: Heightfield, x, z):
    from .heightfield import hf_height

    return hf_height(hf, x, z)


def _hf_height_and_normal(hf: Heightfield, x, z):
    from .heightfield import hf_face_normal, hf_height

    return hf_height(hf, x, z), hf_face_normal(hf, x, z)
