"""Debug draw overlay (reference: core/debug_draw.c + the MT_DEBUG_DRAW
message channel, messagebus.h:112-132 — physics capsules/contacts,
camera/light frusta, AABBs, grids drawn per camera).

Primitives accumulate into a fixed-capacity line buffer (host or
device); ``draw_lines`` rasterizes them over the frame with a pure
device op (parametric line sampling — no pallas needed at debug-overlay
densities). AABB/circle/cross helpers expand to lines like the
reference's consumers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import mathx as mx

MAX_LINES = 512
LINE_SAMPLES = 256   # samples along each line (device rasterization)


class DebugLines(NamedTuple):
    a: jnp.ndarray       # (N, 3) world-space start
    b: jnp.ndarray       # (N, 3) end
    color: jnp.ndarray   # (N, 3)
    valid: jnp.ndarray   # (N,)


def lines_empty(n: int = MAX_LINES) -> DebugLines:
    return DebugLines(
        a=jnp.zeros((n, 3), jnp.float32), b=jnp.zeros((n, 3), jnp.float32),
        color=jnp.ones((n, 3), jnp.float32), valid=jnp.zeros((n,), bool),
    )


def add_line(dl: DebugLines, idx, a, b, color=(1.0, 1.0, 0.0)):
    return DebugLines(
        a=dl.a.at[idx].set(jnp.asarray(a, jnp.float32)),
        b=dl.b.at[idx].set(jnp.asarray(b, jnp.float32)),
        color=dl.color.at[idx].set(jnp.asarray(color, jnp.float32)),
        valid=dl.valid.at[idx].set(True),
    ), idx + 1


def add_aabb(dl: DebugLines, idx, mn, mx_, color=(0.0, 1.0, 0.0)):
    """12 edges of a box (debug_draw.c AABB consumer)."""
    mn = jnp.asarray(mn, jnp.float32)
    mx_ = jnp.asarray(mx_, jnp.float32)
    corners = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corners.append(jnp.array([
                    jnp.where(dx, mx_[0], mn[0]),
                    jnp.where(dy, mx_[1], mn[1]),
                    jnp.where(dz, mx_[2], mn[2])]))
    edges = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for e0, e1 in edges:
        dl, idx = add_line(dl, idx, corners[e0], corners[e1], color)
    return dl, idx


def add_cross(dl: DebugLines, idx, p, size=0.25, color=(1.0, 0.0, 0.0)):
    p = jnp.asarray(p, jnp.float32)
    for ax in range(3):
        off = jnp.zeros(3).at[ax].set(size)
        dl, idx = add_line(dl, idx, p - off, p + off, color)
    return dl, idx


def draw_lines(frame, dl: DebugLines, view, proj):
    """Rasterize debug lines over the frame: project endpoints, sample
    LINE_SAMPLES points per line, scatter colors. Pure device op."""
    H, W = frame.shape[0], frame.shape[1]
    vp = proj @ view

    def project(p):
        v = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        c = jnp.einsum("ij,nj->ni", vp, v)
        w = c[..., 3]
        ok = w > 1e-4
        ndc = c[..., :2] / jnp.where(ok, w, 1.0)[..., None]
        x = (ndc[..., 0] * 0.5 + 0.5) * W
        y = (0.5 - ndc[..., 1] * 0.5) * H
        return x, y, ok

    ax, ay, aok = project(dl.a)
    bx, by, bok = project(dl.b)
    ok = dl.valid & aok & bok

    t = jnp.linspace(0.0, 1.0, LINE_SAMPLES)
    px = ax[:, None] * (1 - t)[None] + bx[:, None] * t[None]   # (N, S)
    py = ay[:, None] * (1 - t)[None] + by[:, None] * t[None]
    inb = ok[:, None] & (px >= 0) & (px < W) & (py >= 0) & (py < H)
    xi = jnp.clip(px.astype(jnp.int32), 0, W - 1).reshape(-1)
    yi = jnp.clip(py.astype(jnp.int32), 0, H - 1).reshape(-1)
    col = jnp.broadcast_to(dl.color[:, None, :],
                           (*px.shape, 3)).reshape(-1, 3)
    m = inb.reshape(-1)
    out = frame.at[yi, xi].set(
        jnp.where(m[:, None], col, frame[yi, xi]))
    return out
