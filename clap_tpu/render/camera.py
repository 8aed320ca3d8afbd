"""3rd-person orbit camera with occlusion shrink (reference:
core/camera.{c,h}).

- pitch clamped to ±~83° (camera.c:11-24)
- target at the character's head joint or ¾ of its AABB height
  (camera_target camera.c:174-206)
- occlusion: rays from the target to the 4 near-plane corners of the
  candidate camera position; if the scene blocks any, the orbit
  distance shrinks by the smallest hit fraction, iterated a fixed
  number of times (camera_position_is_good camera.c:93-117, loop
  camera.c:232-236 — masked fixed-trip here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import mathx as mx
from ..physics.narrowphase import StaticWorld, raycast

PITCH_CLAMP = 1.45          # ~83°, camera.c:11-24
OCCLUSION_ITERS = 3         # camera.c:232-236 loop budget


def camera_target(char_pos, char_height, head_pos=None, has_head=False):
    """camera_target (camera.c:174-206): head joint if present, else ¾
    height above the character origin."""
    default = char_pos + jnp.array([0.0, 1.0, 0.0]) * (char_height * 0.75)
    if head_pos is None:
        return default
    return jnp.where(has_head, head_pos, default)


def _near_corners(eye, target, dist, fovy, aspect, near=0.3):
    """4 near-plane corner points of a camera at ``eye`` looking at
    ``target`` (camera_calc_rays camera.c:60-92)."""
    fwd = mx.normalize(target - eye)
    up0 = jnp.array([0.0, 1.0, 0.0])
    right = mx.normalize(jnp.cross(fwd, up0))
    up = jnp.cross(right, fwd)
    h = jnp.tan(fovy / 2) * near
    w = h * aspect
    base = eye + fwd * near
    cs = []
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            cs.append(base + right * (sx * w) + up * (sy * h))
    return jnp.stack(cs)          # (4, 3)


def camera_update(world: StaticWorld, target, pitch, yaw, want_dist,
                  fovy=jnp.pi / 3, aspect=16 / 9):
    """Orbit + occlusion shrink. Returns (eye, rot_q, dist).

    The C loop retries camera_position_is_good with progressively
    shorter distances; here each iteration casts the 4 corner rays and
    scales the distance by the smallest blocked fraction (masked,
    fixed-trip)."""
    pitch = jnp.clip(pitch, -PITCH_CLAMP, PITCH_CLAMP)
    q = mx.qmul(
        mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw),
        mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), pitch),
    )

    def shrink(_, dist):
        eye = mx.transform_orbit(q, target, dist)
        corners = _near_corners(eye, target, dist, fovy, aspect)

        def ray_frac(c):
            d = c - target
            ln = jnp.linalg.norm(d)
            hit_dist, hit = raycast(world, target, d / jnp.maximum(ln, 1e-6),
                                    ln, n_march=8)
            return jnp.where(hit, hit_dist / jnp.maximum(ln, 1e-6), 1.0)

        fracs = jax.vmap(ray_frac)(corners)
        scale = jnp.min(fracs)
        return jnp.where(scale < 0.99, dist * scale, dist)

    dist = jax.lax.fori_loop(0, OCCLUSION_ITERS, shrink, want_dist)
    dist = jnp.maximum(dist, 0.5)
    eye = mx.transform_orbit(q, target, dist)
    return eye, q, dist


def camera_view_proj(eye, rot_q, fovy, aspect, near=0.1, far=200.0):
    """View matrix per transform_view_mat4x4 + GL projection
    (scene_cameras_calc, scene.c:1004-1048)."""
    view = mx.transform_view_mat4(eye, rot_q)
    proj = mx.mat4_perspective(fovy, aspect, near, far)
    return view, proj
