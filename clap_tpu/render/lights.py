"""Light state + tiled light culling (reference: core/light.{c,h}).

SoA arrays for up to LIGHTS_MAX=128 lights (light.h:20-25,
shader_constants.h:8). The tiled culling grid (light_grid_compute
light.c:88-153) becomes a small jnp op: project each light's sphere to
screen, mark the tiles its radius touches, pack per-tile masks. Shading
consumes the mask to skip out-of-range lights.

TILE_WIDTH mirrors shader_constants.h:16 (64 px).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

LIGHTS_MAX = 128
LIGHT_TILE = 64


class Lights(NamedTuple):
    """(L,) SoA light arrays; L is the scene's static light capacity."""

    pos: jnp.ndarray        # (L, 3)
    color: jnp.ndarray      # (L, 3)
    attenuation: jnp.ndarray  # (L, 3) constant, linear, quadratic
    direction: jnp.ndarray  # (L, 3) for directional/spot
    cutoff: jnp.ndarray     # (L,) cos inner cutoff; <=-1 → point light
    is_dir: jnp.ndarray     # (L,) bool directional
    active: jnp.ndarray     # (L,) bool


def lights_empty(n: int = 8) -> Lights:
    z3 = jnp.zeros((n, 3), jnp.float32)
    return Lights(
        pos=z3, color=z3, attenuation=jnp.tile(jnp.array([1.0, 0.0, 0.0]), (n, 1)),
        direction=z3, cutoff=jnp.full((n,), -2.0, jnp.float32),
        is_dir=jnp.zeros((n,), bool), active=jnp.zeros((n,), bool),
    )


def light_radius(lights: Lights, eps: float = 0.02):
    """Effective radius where attenuation drops below eps:
    solve 1/(kc + kl·d + kq·d²) = eps (light.c projects this sphere)."""
    kc, kl, kq = (lights.attenuation[:, i] for i in range(3))
    inv_eps = 1.0 / eps
    # kq d² + kl d + (kc - 1/eps) = 0
    disc = jnp.maximum(kl * kl - 4 * kq * (kc - inv_eps), 0.0)
    d_quad = (-kl + jnp.sqrt(disc)) / jnp.maximum(2 * kq, 1e-9)
    d_lin = (inv_eps - kc) / jnp.maximum(kl, 1e-9)
    r = jnp.where(kq > 1e-9, d_quad, jnp.where(kl > 1e-9, d_lin, 1e4))
    return jnp.where(lights.is_dir, 1e9, r)


def light_grid(lights: Lights, view, proj, width: int, height: int):
    """Per-tile light masks (light_grid_compute light.c:88-153).

    Returns (n_ty, n_tx, L) bool — the boolean form of the reference's
    packed ui32vec4 bitmask texture; shading gathers the pixel's tile
    row and masks the light loop."""
    ntx = -(-width // LIGHT_TILE)
    nty = -(-height // LIGHT_TILE)
    L = lights.pos.shape[0]

    vpos = jnp.einsum("ij,lj->li", view[:3, :3], lights.pos) + view[:3, 3]
    r = light_radius(lights)

    clip = jnp.einsum("ij,lj->li", proj,
                      jnp.concatenate([vpos, jnp.ones((L, 1))], -1))
    w = clip[:, 3]
    behind = w <= 1e-6
    ndc = clip[:, :2] / jnp.where(behind, 1.0, w)[:, None]
    cx = (ndc[:, 0] * 0.5 + 0.5) * width
    cy = (0.5 - ndc[:, 1] * 0.5) * height
    # screen-space radius (light.c:118-124): r · proj[0][0]/(-z_view) · w/2
    sr = r * proj[0, 0] / jnp.maximum(-vpos[:, 2], 1e-3) * (width / 2)

    tx = (jnp.arange(ntx) + 0.5) * LIGHT_TILE
    ty = (jnp.arange(nty) + 0.5) * LIGHT_TILE
    dx = jnp.abs(tx[None, None, :] - cx[:, None, None])
    dy = jnp.abs(ty[None, :, None] - cy[:, None, None])
    # tile within radius: distance from tile center minus tile half-diag
    half = LIGHT_TILE * 0.7072
    dist2 = jnp.maximum(dx - half, 0) ** 2 + jnp.maximum(dy - half, 0) ** 2
    in_tile = dist2 <= (sr[:, None, None] ** 2)
    mask = jnp.where(
        (lights.is_dir | behind)[:, None, None] & lights.active[:, None, None],
        True, in_tile & lights.active[:, None, None] & ~behind[:, None, None],
    )
    # inactive lights never shade
    mask = mask & lights.active[:, None, None]
    return jnp.transpose(mask, (1, 2, 0))     # (nty, ntx, L)
