"""Closest-point geometry primitives for the batched narrowphase.

Replaces ODE's dCollide kernels (capsule/sphere vs trimesh — the only
geom classes the reference uses, physics.h:26-29) with branchless,
vmap-friendly closest-point routines (Ericson, "Real-Time Collision
Detection" ch. 5 formulations, rewritten mask-based).

All functions broadcast over leading batch axes; points are (..., 3).
"""
from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def closest_pt_segment(p, a, b):
    """Closest point on segment [a, b] to point p."""
    ab = b - a
    t = _dot(p - a, ab) / jnp.maximum(_dot(ab, ab), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def closest_pt_triangle(p, a, b, c):
    """Closest point on triangle abc to point p (branchless Ericson 5.1.5)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = _dot(ab, ap)
    d2 = _dot(ac, ap)
    bp = p - b
    d3 = _dot(ab, bp)
    d4 = _dot(ac, bp)
    cp = p - c
    d5 = _dot(ab, cp)
    d6 = _dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region masks
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    v_ab = jnp.where(jnp.abs(d1 - d3) > 1e-12, d1 / jnp.where(d1 - d3 == 0, 1.0, d1 - d3), 0.0)
    p_ab = a + jnp.clip(v_ab, 0, 1)[..., None] * ab
    w_ac = d2 / jnp.where(d2 - d6 == 0, 1.0, d2 - d6)
    p_ac = a + jnp.clip(w_ac, 0, 1)[..., None] * ac
    w_bc = (d4 - d3) / jnp.where((d4 - d3) + (d5 - d6) == 0, 1.0, (d4 - d3) + (d5 - d6))
    p_bc = b + jnp.clip(w_bc, 0, 1)[..., None] * (c - b)

    denom = jnp.where(va + vb + vc == 0, 1.0, va + vb + vc)
    v = vb / denom
    w = vc / denom
    p_face = a + v[..., None] * ab + w[..., None] * ac

    out = p_face
    out = jnp.where(on_bc[..., None], p_bc, out)
    out = jnp.where(on_ac[..., None], p_ac, out)
    out = jnp.where(on_ab[..., None], p_ab, out)
    out = jnp.where(in_c[..., None], c, out)
    out = jnp.where(in_b[..., None], b, out)
    out = jnp.where(in_a[..., None], a, out)
    return out


def closest_pt_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2]; returns (c1, c2).
    Branchless version of Ericson 5.1.9."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = _dot(d1, d1)
    e = _dot(d2, d2)
    f = _dot(d2, r)
    c = _dot(d1, r)
    b = _dot(d1, d2)
    denom = a * e - b * b

    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.where(denom == 0, 1.0, denom), 0, 1), 0.0)
    t = (b * s + f) / jnp.where(e == 0, 1.0, e)
    # clamp t, then recompute s
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.where(a == 0, 1.0, a), 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.where(e == 0, 1.0, e), 0.0, 1.0)
    # degenerate segments
    s = jnp.where(a <= 1e-12, 0.0, s)
    t = jnp.where(e <= 1e-12, 0.0, t)
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t[..., None] * d2
    return c1, c2


def segment_triangle_closest(p0, p1, a, b, c):
    """Closest points between segment [p0,p1] and triangle abc.

    Returns (pt_seg, pt_tri, dist). Exact when they don't intersect; when
    the segment pierces the triangle, returns distance 0 at the crossing.
    """
    n = jnp.cross(b - a, c - a)
    nn = jnp.maximum(_dot(n, n), 1e-20)
    # segment-plane crossing
    d0 = _dot(p0 - a, n)
    d1 = _dot(p1 - a, n)
    crosses = d0 * d1 < 0
    t_hit = d0 / jnp.where(d0 - d1 == 0, 1.0, d0 - d1)
    hit = p0 + jnp.clip(t_hit, 0, 1)[..., None] * (p1 - p0)
    # barycentric inside test for the crossing point
    hc = closest_pt_triangle(hit, a, b, c)
    inside = _dot(hit - hc, hit - hc) < 1e-10 * nn
    pierce = crosses & inside

    # candidates: endpoints vs triangle, segment vs 3 edges
    cands_seg = []
    cands_tri = []
    for p in (p0, p1):
        ct = closest_pt_triangle(p, a, b, c)
        cands_seg.append(p)
        cands_tri.append(ct)
    for e0, e1 in ((a, b), (b, c), (c, a)):
        cs, ce = closest_pt_segment_segment(p0, p1, e0, e1)
        cands_seg.append(cs)
        cands_tri.append(ce)

    # branchless min-select chain over the 5 candidates (first minimum
    # wins, matching argmin semantics) — an argmin + take_along_axis here
    # lowers to TPU gathers at ~10 ns/row, which dominated the batched
    # narrowphase; the where-chain is pure fused vector math
    ds = [ _dot(s - t, s - t) for s, t in zip(cands_seg, cands_tri) ]
    best_d, pt_seg, pt_tri = ds[0], cands_seg[0], cands_tri[0]
    for d, s, t in zip(ds[1:], cands_seg[1:], cands_tri[1:]):
        w = d < best_d
        best_d = jnp.where(w, d, best_d)
        pt_seg = jnp.where(w[..., None], s, pt_seg)
        pt_tri = jnp.where(w[..., None], t, pt_tri)
    dist = jnp.sqrt(best_d)

    pt_seg = jnp.where(pierce[..., None], hit, pt_seg)
    pt_tri = jnp.where(pierce[..., None], hit, pt_tri)
    dist = jnp.where(pierce, 0.0, dist)
    return pt_seg, pt_tri, dist


def capsule_triangle_contact(p0, p1, r, a, b, c):
    """Capsule (segment [p0,p1], radius r) vs triangle abc.

    Returns (depth, normal, contact_point): depth > 0 on penetration;
    normal points from the triangle toward the capsule (the direction to
    push the capsule out — matches the flipped-ODE convention used by the
    sweep, physics.c:619-629); contact on the triangle surface.
    """
    ps, pt, dist = segment_triangle_closest(p0, p1, a, b, c)
    tri_n = jnp.cross(b - a, c - a)
    tri_n = tri_n / jnp.maximum(
        jnp.linalg.norm(tri_n, axis=-1, keepdims=True), 1e-12
    )
    diff = ps - pt
    # normal: separation direction when distinct, else triangle normal
    # oriented toward the capsule axis midpoint
    dn = diff / jnp.maximum(dist[..., None], 1e-9)
    mid = 0.5 * (p0 + p1)
    sign = jnp.sign(_dot(mid - pt, tri_n))[..., None]
    fallback = tri_n * jnp.where(sign == 0, 1.0, sign)
    normal = jnp.where(dist[..., None] > 1e-7, dn, fallback)
    depth = r - dist
    return depth, normal, pt


def ray_triangle(origin, direction, a, b, c, backface_cull=True):
    """Möller–Trumbore; returns (t, hit_mask). direction need not be unit;
    t is in units of |direction|. Backface culling matches
    dGeomRaySetBackfaceCull(ray, 1) (physics.c:489)."""
    e1 = b - a
    e2 = c - a
    pvec = jnp.cross(direction, e2)
    det = _dot(e1, pvec)
    if backface_cull:
        ok = det > 1e-12
    else:
        ok = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    tvec = origin - a
    u = _dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = _dot(direction, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return jnp.where(hit, t, jnp.inf), hit
