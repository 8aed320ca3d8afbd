"""Motion controller (reference: core/motion.{c,h}).

Input sticks → camera-relative normalized XZ motion vector
(motion_compute, motion.c:115-120). Pure jnp; broadcasts over envs.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import mathx as mx


def motion_compute_ls(left, right, up, down, delta_lx=0.0, delta_ly=0.0):
    """Digital + analog left-stick merge (motion.c:64-80): diagonal
    movement normalized by cos/sin(π/4)."""
    dx = jnp.asarray(right, jnp.float32) - jnp.asarray(left, jnp.float32)
    dy = jnp.asarray(down, jnp.float32) - jnp.asarray(up, jnp.float32)
    both = (jnp.abs(dx) > 0) & (jnp.abs(dy) > 0)
    inv = jnp.float32(jnp.cos(jnp.pi / 4))
    dx = jnp.where(both, dx * inv, dx)
    dy = jnp.where(both, dy * inv, dy)
    analog = (jnp.abs(jnp.asarray(delta_lx)) > 0) | (jnp.abs(jnp.asarray(delta_ly)) > 0)
    ang = jnp.arctan2(delta_ly, delta_lx)
    dx = jnp.where(analog & (dx == 0), jnp.cos(ang), dx)
    dy = jnp.where(analog & (dy == 0), jnp.sin(ang), dy)
    return dx, dy


def motion_get(ls_dx, ls_dy, cam_rot_q, lin_speed):
    """motion_get (motion.c:91-113): rotate the stick vector by the
    camera orientation, project to XZ, renormalize, scale."""
    d = jnp.stack([ls_dx * lin_speed, jnp.zeros_like(ls_dx), ls_dy * lin_speed],
                  axis=-1)
    small = jnp.sum(d * d, -1) < 1e-5
    r = mx.qrot(cam_rot_q, d)
    d2 = jnp.stack([r[..., 0], r[..., 2]], -1)
    n2 = jnp.sum(d2 * d2, -1, keepdims=True)
    d2 = jnp.where(n2 > 0, d2 / jnp.sqrt(jnp.maximum(n2, 1e-12)) * lin_speed, 0.0)
    dx = jnp.where(small, 0.0, d2[..., 0])
    dz = jnp.where(small, 0.0, d2[..., 1])
    return dx, dz


def camera_yaw_quat(yaw):
    return mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
