"""Views, frusta, cascaded shadow fitting (reference: core/view.{c,h}).

A ``Subview`` is a (view, proj) matrix pair plus derived frustum planes —
the reference's struct subview (view.h:9-29). The main view owns
CASCADES_MAX=4 shadow subviews (shader_constants.h:9) whose ortho
projections are fitted per cascade to the camera frustum corners in
light space (subview_update_from_target view.c:195-228).

Everything is pure jnp and broadcasts over leading batch axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import mathx as mx

CASCADES_MAX = 4
# cascade split distances (view.c:13): {15, 50, 150, far}
CASCADE_SPLITS = (15.0, 50.0, 150.0)


class Subview(NamedTuple):
    view: jnp.ndarray        # (4, 4)
    proj: jnp.ndarray        # (4, 4)
    # frustum planes (6, 4): nx,ny,nz,d with n·p + d >= 0 inside
    planes: jnp.ndarray


def frustum_planes(viewproj: jnp.ndarray) -> jnp.ndarray:
    """Extract the 6 clip planes from a view-projection matrix
    (Gribb/Hartmann; replaces view_update_perspective_frusta
    view.c:248-295). Rows of VP: m0..m3; planes = m3 ± mi."""
    m = viewproj
    rows = [m[..., 3, :] + m[..., 0, :],   # left
            m[..., 3, :] - m[..., 0, :],   # right
            m[..., 3, :] + m[..., 1, :],   # bottom
            m[..., 3, :] - m[..., 1, :],   # top
            m[..., 3, :] + m[..., 2, :],   # near
            m[..., 3, :] - m[..., 2, :]]   # far
    planes = jnp.stack(rows, axis=-2)
    n = jnp.linalg.norm(planes[..., :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(n, 1e-12)


def make_subview(view: jnp.ndarray, proj: jnp.ndarray) -> Subview:
    vp = proj @ view
    return Subview(view=view, proj=proj, planes=frustum_planes(vp))


def aabb_in_frustum(planes: jnp.ndarray, aabb_min, aabb_max):
    """view_entity_in_frustum (view.c:296-336): conservative 8-corner
    test — an AABB is culled only if all 8 corners are outside one
    plane. Batched over entities (leading axes of aabb_*)."""
    # p-vertex trick: for each plane pick the AABB corner most positive
    # along the plane normal; if even that is outside, the box is out.
    n = planes[..., :3]                       # (6, 3)
    d = planes[..., 3]                        # (6,)
    pos = jnp.where(n[..., None, :, :] >= 0,
                    aabb_max[..., None, :], aabb_min[..., None, :])  # (..., 6, 3)
    dist = jnp.sum(pos * n, axis=-1) + d
    return jnp.all(dist >= 0, axis=-1)        # inside-ish (not culled)


def frustum_corners_world(view, proj, near_t=0.0, far_t=1.0):
    """8 world-space corners of the [near_t, far_t] depth slice of the
    frustum (used for CSM fitting, view.c:150-193). t in [0,1] along the
    NDC z range."""
    inv = jnp.linalg.inv(proj @ view)
    xs = jnp.array([-1.0, 1.0])
    corners = []
    for z in (near_t * 2 - 1, far_t * 2 - 1):
        for y in (-1.0, 1.0):
            for x in (-1.0, 1.0):
                corners.append(jnp.array([x, y, z, 1.0]))
    c = jnp.stack(corners)                    # (8, 4)
    w = jnp.einsum("ij,kj->ki", inv, c)
    return w[:, :3] / w[:, 3:4]


def cascade_subviews(cam_view, cam_proj, light_dir, near, far,
                     tex_size: float = 2048.0):
    """Fit CASCADES_MAX ortho light views to the camera frustum slices
    (subview_update_from_target view.c:195-228 + projection fit
    view.c:129-148).

    light_dir: (3,) direction the light travels (pointing down-scene).
    Returns stacked Subview with leading cascade axis, and the cascade
    far-plane view distances for the shader's cascade select
    (shadow.glsl:148-155).
    """
    splits = list(CASCADE_SPLITS) + [None]
    dists = []
    views = []
    projs = []
    up = jnp.array([0.0, 1.0, 0.0])
    ldir = mx.normalize(light_dir)
    for i in range(CASCADES_MAX):
        d0 = 0.0 if i == 0 else dists[-1]
        d1 = jnp.asarray(splits[i] if splits[i] is not None else far,
                         dtype=jnp.float32)
        d1 = jnp.minimum(d1, far)
        # slice fractions along the linear view depth → NDC t via
        # projection of the split distances
        def ndc_t(dist):
            # for GL perspective: z_ndc = (f+n)/(f-n) + 2fn/((f-n)·z_view⁻¹)…
            # use the projection directly on (0,0,-dist)
            p = cam_proj @ jnp.array([0.0, 0.0, -1.0, 0.0]) * dist \
                + cam_proj @ jnp.array([0.0, 0.0, 0.0, 1.0])
            return (p[2] / p[3] + 1.0) * 0.5

        # cascade 0 starts AT the near plane: t=0 directly — ndc_t(0)
        # projects the camera origin (w = 0 → ±inf), which NaN'd the
        # whole cascade-0 fit and silently killed every near-field CSM
        # shadow (pixels selecting cascade 0 fail vsm_shadow's w guard
        # and return lit)
        t0 = jnp.float32(0.0) if i == 0 else ndc_t(jnp.float32(d0) + 1e-4)
        corners = frustum_corners_world(cam_view, cam_proj, t0, ndc_t(d1))
        center = corners.mean(axis=0)
        eye = center - ldir * 1.0
        lview = mx.mat4_look_at_safe(eye, center, up)
        lc = mx.mat4_transform_point(lview, corners)   # (8, 3)
        mn = lc.min(axis=0)
        mxx = lc.max(axis=0)
        # back the light eye up by the AABB depth (view.c:212-220)
        near_l = -(mxx[2] + 50.0)
        far_l = -(mn[2] - 1.0)
        proj = mx.mat4_ortho(mn[0], mxx[0], mn[1], mxx[1], near_l, far_l)
        views.append(lview)
        projs.append(proj)
        dists.append(d1)
    sv = [make_subview(v, p) for v, p in zip(views, projs)]
    stacked = Subview(
        view=jnp.stack([s.view for s in sv]),
        proj=jnp.stack([s.proj for s in sv]),
        planes=jnp.stack([s.planes for s in sv]),
    )
    return stacked, jnp.stack(dists)


def bounds_light_subview(aabb_min, aabb_max, light_dir, far: float = 1e4,
                         pad: float = 1.02):
    """ONE stable ortho light view fitted to a world AABB — view-
    independent, so a multi-view batch over a shared scene can render a
    single shared shadow atlas instead of per-view cascades (the
    multi-view analogue of view.c's per-camera CSM fit; quality trades
    cascade locality for a 1/B shadow cost at B views).

    Returns (Subview with leading cascade axis of 1, cascade_dists (1,)).
    """
    up = jnp.array([0.0, 1.0, 0.0])
    ldir = mx.normalize(light_dir)
    mn = jnp.asarray(aabb_min, jnp.float32)
    mxx = jnp.asarray(aabb_max, jnp.float32)
    center = 0.5 * (mn + mxx)
    eye = center - ldir * 1.0
    lview = mx.mat4_look_at_safe(eye, center, up)
    corners = jnp.stack([
        jnp.array([x, y, z])
        for x in (0, 1) for y in (0, 1) for z in (0, 1)
    ]).astype(jnp.float32)
    wc = mn[None, :] + corners * (mxx - mn)[None, :]
    lc = mx.mat4_transform_point(lview, wc)
    lctr = 0.5 * (lc.min(axis=0) + lc.max(axis=0))
    lhalf = 0.5 * (lc.max(axis=0) - lc.min(axis=0)) * pad
    lmn = lctr - lhalf
    lmx = lctr + lhalf
    near_l = -(lmx[2] + 50.0)
    far_l = -(lmn[2] - 1.0)
    proj = mx.mat4_ortho(lmn[0], lmx[0], lmn[1], lmx[1], near_l, far_l)
    sv = make_subview(lview, proj)
    stacked = Subview(view=sv.view[None], proj=sv.proj[None],
                      planes=sv.planes[None])
    return stacked, jnp.array([far], jnp.float32)
