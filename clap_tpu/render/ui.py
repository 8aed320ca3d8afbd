"""Retained-mode quad UI (reference: core/ui.c — 1644 LoC quad/text UI
rendered via its own model queue after the 3D pipeline, clap.c:645-648).

UI elements use parent-relative fractional layout with affinity flags
(ui.h:10-28: UI_AF_TOP/BOTTOM/LEFT/RIGHT/CENTER/...). Layout resolution
runs on host (it changes rarely); the composite onto the frame is a pure
device op (alpha-blended quads + text bitmaps), replacing the GL draw of
the UI model queue.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntFlag

import jax.numpy as jnp
import numpy as np

from .font import render_text, text_size


class AF(IntFlag):
    """Affinity flags (ui.h:10-28)."""

    LEFT = 1
    RIGHT = 2
    TOP = 4
    BOTTOM = 8
    CENTER = LEFT | RIGHT
    VCENTER = TOP | BOTTOM


@dataclass
class UiElement:
    """A quad (and optionally text) with fractional layout."""

    x: float = 0.0            # offset (pixels, from affinity edge)
    y: float = 0.0
    w: float = 0.1            # size: fraction of parent if <= 1, else px
    h: float = 0.1
    affinity: AF = AF.LEFT | AF.TOP
    color: tuple = (1.0, 1.0, 1.0, 0.6)
    text: str | None = None
    text_scale: int = 2
    children: list = field(default_factory=list)
    visible: bool = True


@dataclass
class ResolvedQuad:
    x0: int
    y0: int
    x1: int
    y1: int
    color: tuple
    text_bitmap: np.ndarray | None = None


def _resolve(el: UiElement, px0, py0, px1, py1, out):
    if not el.visible:
        return
    pw, ph = px1 - px0, py1 - py0
    w = el.w * pw if el.w <= 1.0 else el.w
    h = el.h * ph if el.h <= 1.0 else el.h
    if el.text is not None:
        th, tw = text_size(el.text, el.text_scale)
        w = max(w, tw + 8)
        h = max(h, th + 8)

    if el.affinity & AF.CENTER == AF.CENTER:
        x0 = px0 + (pw - w) / 2 + el.x
    elif el.affinity & AF.RIGHT:
        x0 = px1 - w - el.x
    else:
        x0 = px0 + el.x
    if el.affinity & AF.VCENTER == AF.VCENTER:
        y0 = py0 + (ph - h) / 2 + el.y
    elif el.affinity & AF.BOTTOM:
        y0 = py1 - h - el.y
    else:
        y0 = py0 + el.y

    tb = None
    if el.text is not None:
        tb = render_text(el.text, el.text_scale)
    out.append(ResolvedQuad(int(x0), int(y0), int(x0 + w), int(y0 + h),
                            el.color, tb))
    for c in el.children:
        _resolve(c, int(x0), int(y0), int(x0 + w), int(y0 + h), out)


def ui_layout(root_elements: list, width: int, height: int) -> list:
    """Resolve the element tree to screen-space quads."""
    out: list[ResolvedQuad] = []
    for el in root_elements:
        _resolve(el, 0, 0, width, height, out)
    return out


def ui_compose(frame: jnp.ndarray, quads: list) -> jnp.ndarray:
    """Alpha-composite resolved quads (+text) over the rendered frame —
    the models_render(&ui->mq) overlay step (clap.c:645-648).

    Host-resolved static layout → device composite (pure, jit-able once
    the quad list is fixed)."""
    H, W = frame.shape[0], frame.shape[1]
    out = frame
    for q in quads:
        x0, y0 = max(q.x0, 0), max(q.y0, 0)
        x1, y1 = min(q.x1, W), min(q.y1, H)
        if x1 <= x0 or y1 <= y0:
            continue
        col = jnp.asarray(q.color[:3], frame.dtype)
        a = float(q.color[3])
        region = out[y0:y1, x0:x1]
        blended = region * (1 - a) + col[None, None] * a
        out = out.at[y0:y1, x0:x1].set(blended)
        if q.text_bitmap is not None:
            tb = q.text_bitmap
            th, tw = tb.shape
            tx0 = x0 + 4
            ty0 = y0 + 4
            tx1 = min(tx0 + tw, W)
            ty1 = min(ty0 + th, H)
            if tx1 > tx0 and ty1 > ty0:
                alpha = jnp.asarray(tb[: ty1 - ty0, : tx1 - tx0, None],
                                    frame.dtype)
                reg = out[ty0:ty1, tx0:tx1]
                out = out.at[ty0:ty1, tx0:tx1].set(
                    reg * (1 - alpha) + alpha * 1.0)
    return out


def osd(text: str, **kw) -> UiElement:
    """On-screen-display helper (the demo help overlay pattern,
    onehandclap.c OSD)."""
    return UiElement(text=text, affinity=AF.CENTER | AF.TOP, y=20,
                     color=(0.05, 0.05, 0.1, 0.55), **kw)
