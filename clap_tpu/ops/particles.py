"""Particle systems (reference: core/particle.{c,h}).

Batched SoA replacement for the reference's per-particle linked lists:
one (S systems, P particles, 3) position/velocity state advanced per
frame. Semantics match particle.c:

- spawn on a hollow sphere shell [min_radius, radius] around the system
  center with 4 radial distributions (u, √u, ∛u, u^0.75 —
  particle.c:36-67)
- per-frame Euler step pos += velocity; respawn when the particle
  leaves radius² (particles_update particle.c:89-120)
- PARTICLES_MAX = 1024 per system (shader_constants.h:7)
- billboarding transposes the view rotation at render time
  (particle.c:93-100) — provided as ``billboard_matrix``

Randomness uses jax.random keys threaded through state (the drand48
global stream has no place in a pure batched step).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PARTICLES_MAX = 1024

PART_DIST_LIN = 0
PART_DIST_SQRT = 1
PART_DIST_CBRT = 2
PART_DIST_POW075 = 3


class ParticleParams(NamedTuple):
    """Static per-system config, (S,) arrays."""

    active: jnp.ndarray      # bool
    radius: jnp.ndarray      # f32 shell outer radius
    min_radius: jnp.ndarray  # f32 shell inner radius
    velocity: jnp.ndarray    # f32 velocity scale
    dist: jnp.ndarray        # int32 PART_DIST_*
    count: jnp.ndarray       # int32 live particles (≤ P)


class ParticleState(NamedTuple):
    pos: jnp.ndarray         # (S, P, 3) world positions
    vel: jnp.ndarray         # (S, P, 3)
    key: jnp.ndarray         # PRNG key


def _radial(u, dist):
    return jnp.where(
        dist == PART_DIST_SQRT, jnp.sqrt(u),
        jnp.where(dist == PART_DIST_CBRT, jnp.cbrt(u),
                  jnp.where(dist == PART_DIST_POW075, jnp.power(u, 0.75), u)))


def _spawn(key, center, radius, min_radius, dist, shape):
    k1, k2 = jax.random.split(key)
    d = jax.random.uniform(k1, (*shape, 3), minval=-1.0, maxval=1.0)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    u = jax.random.uniform(k2, shape)
    r = min_radius + (radius - min_radius) * _radial(u, dist)
    return center + d * r[..., None]


def particles_init(params: ParticleParams, centers, key) -> ParticleState:
    """Spawn all systems (S, P)."""
    s, = params.active.shape
    k1, k2, k3 = jax.random.split(key, 3)
    pos = _spawn(k1, centers[:, None, :], params.radius[:, None],
                 params.min_radius[:, None], params.dist[:, None],
                 (s, PARTICLES_MAX))
    vel = jax.random.uniform(k2, (s, PARTICLES_MAX, 3), minval=-1.0,
                             maxval=1.0) * params.velocity[:, None, None]
    return ParticleState(pos=pos, vel=vel, key=k3)


def particles_update(params: ParticleParams, st: ParticleState,
                     centers) -> ParticleState:
    """particles_update (particle.c:89-120): respawn escapees, Euler
    step. centers: (S, 3) current system centers."""
    k, k1, k2 = jax.random.split(st.key, 3)
    d = st.pos - centers[:, None, :]
    escaped = jnp.sum(d * d, -1) > (params.radius ** 2)[:, None]

    new_pos = _spawn(k1, centers[:, None, :], params.radius[:, None],
                     params.min_radius[:, None], params.dist[:, None],
                     st.pos.shape[:2])
    new_vel = jax.random.uniform(k2, st.vel.shape, minval=-1.0,
                                 maxval=1.0) * params.velocity[:, None, None]

    pos = jnp.where(escaped[..., None], new_pos, st.pos)
    vel = jnp.where(escaped[..., None], new_vel, st.vel)
    pos = pos + vel
    return ParticleState(pos=pos, vel=vel, key=k)


def billboard_matrix(view):
    """Camera-facing model rotation: transpose of the view rotation
    (particle.c:93-100)."""
    m = jnp.eye(4, dtype=view.dtype)
    return m.at[:3, :3].set(view[:3, :3].T)


def particle_clip_quads(pos, size, cam_view, cam_proj, active=None):
    """Camera-facing billboard quads as a clip-space triangle stream
    (the instanced particle draw, particle.c:122-125 + particle.vert):
    each particle becomes two triangles spanning ±size in VIEW space.

    pos: (P, 3) world positions (flatten multi-system pools first);
    active: (P,) bool. Returns (tri_verts (2P·3, 4) clip coords,
    faces (2P, 3) int32, valid (2P,), owner (2P,) particle index).
    """
    P = pos.shape[0]
    p4 = jnp.concatenate([pos, jnp.ones((P, 1), pos.dtype)], axis=-1)
    vp = jnp.einsum("ij,pj->pi", cam_view, p4)[:, :3]     # view space
    s = jnp.broadcast_to(jnp.asarray(size, pos.dtype), (P,))[:, None]
    right = jnp.array([1.0, 0.0, 0.0], pos.dtype)
    up = jnp.array([0.0, 1.0, 0.0], pos.dtype)
    c00 = vp + (-right - up) * s
    c10 = vp + (right - up) * s
    c01 = vp + (-right + up) * s
    c11 = vp + (right + up) * s
    corners = jnp.stack([c00, c10, c01, c11], axis=1)     # (P, 4, 3)
    c4 = jnp.concatenate(
        [corners, jnp.ones((P, 4, 1), pos.dtype)], axis=-1)
    clip = jnp.einsum("ij,pkj->pki", cam_proj, c4)        # (P, 4, 4)
    # CCW in view space (y up): (00, 10, 01) and (10, 11, 01)
    t1 = clip[:, jnp.array([0, 1, 2])]
    t2 = clip[:, jnp.array([1, 3, 2])]
    tris = jnp.stack([t1, t2], axis=1).reshape(P * 2, 3, 4)
    valid = jnp.ones((P,), bool) if active is None else active
    valid2 = jnp.repeat(valid, 2)
    owner = jnp.repeat(jnp.arange(P, dtype=jnp.int32), 2)
    faces = jnp.arange(P * 2 * 3, dtype=jnp.int32).reshape(-1, 3)
    return tris.reshape(-1, 4), faces, valid2, owner
