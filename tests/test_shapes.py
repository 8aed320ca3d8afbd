"""Geometry primitive tests vs brute-force numeric references."""
import numpy as np
import jax.numpy as jnp

from clap_tpu.physics import shapes


def brute_tri_closest(p, a, b, c, n=120):
    """Dense barycentric sampling reference."""
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u)
    m = uu + vv <= 1
    uu, vv = uu[m], vv[m]
    pts = a[None] + uu[:, None] * (b - a)[None] + vv[:, None] * (c - a)[None]
    d = np.linalg.norm(pts - p[None], axis=-1)
    i = np.argmin(d)
    return pts[i], d[i]


def test_closest_pt_triangle():
    rng = np.random.default_rng(0)
    for _ in range(24):
        a, b, c, p = rng.standard_normal((4, 3))
        got = np.asarray(shapes.closest_pt_triangle(
            jnp.asarray(p), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)))
        ref_pt, ref_d = brute_tri_closest(p, a, b, c)
        assert abs(np.linalg.norm(got - p) - ref_d) < 5e-2  # sampling res limit
        # got must lie on the triangle plane or boundary: dist can't beat ref
        # (1e-5 slack: got is float32, ref is float64)
        assert np.linalg.norm(got - p) <= ref_d + 1e-5


def test_segment_segment():
    # crossing segments distance
    p1, q1 = np.array([0, 0, 0.0]), np.array([1, 0, 0.0])
    p2, q2 = np.array([0.5, 1, 1.0]), np.array([0.5, -1, 1.0])
    c1, c2 = shapes.closest_pt_segment_segment(*map(jnp.asarray, (p1, q1, p2, q2)))
    d = float(jnp.linalg.norm(c1 - c2))
    assert abs(d - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(c1), [0.5, 0, 0], atol=1e-6)


def test_segment_triangle_pierce():
    a, b, c = (np.array([0, 0, 0.0]), np.array([2, 0, 0.0]), np.array([0, 0, 2.0]))
    p0, p1 = np.array([0.5, -1, 0.5]), np.array([0.5, 1, 0.5])
    ps, pt, d = shapes.segment_triangle_closest(
        *map(jnp.asarray, (p0, p1, a, b, c)))
    assert float(d) < 1e-6
    np.testing.assert_allclose(np.asarray(pt), [0.5, 0, 0.5], atol=1e-5)


def test_segment_triangle_above():
    a, b, c = (np.array([0, 0, 0.0]), np.array([2, 0, 0.0]), np.array([0, 0, 2.0]))
    p0, p1 = np.array([0.5, 0.7, 0.5]), np.array([0.5, 2.0, 0.5])
    ps, pt, d = shapes.segment_triangle_closest(
        *map(jnp.asarray, (p0, p1, a, b, c)))
    assert abs(float(d) - 0.7) < 1e-6
    np.testing.assert_allclose(np.asarray(ps), p0, atol=1e-6)


def test_capsule_triangle_contact_depth_normal():
    a, b, c = (np.array([-5, 0, -5.0]), np.array([5, 0, -5.0]), np.array([-5, 0, 5.0]))
    # vertical capsule, bottom sphere 0.2 above the plane, r=0.5 -> depth 0.3
    p0, p1 = np.array([0.0, 0.7, 0.0]), np.array([0.0, 1.7, 0.0])
    depth, n, cp = shapes.capsule_triangle_contact(
        jnp.asarray(p0), jnp.asarray(p1), 0.5,
        *map(jnp.asarray, (a, b, c)))
    assert abs(float(depth) - (0.5 - 0.7)) < 1e-6 or abs(float(depth) + 0.2) < 1e-6
    # depth = r - dist = 0.5 - 0.7 = -0.2 (no contact)
    assert float(depth) < 0
    p0, p1 = np.array([0.0, 0.3, 0.0]), np.array([0.0, 1.3, 0.0])
    depth, n, cp = shapes.capsule_triangle_contact(
        jnp.asarray(p0), jnp.asarray(p1), 0.5,
        *map(jnp.asarray, (a, b, c)))
    assert abs(float(depth) - 0.2) < 1e-6
    np.testing.assert_allclose(np.asarray(n), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp), [0, 0, 0], atol=1e-5)


def test_ray_triangle():
    a, b, c = (jnp.array([0.0, 0, 0]), jnp.array([0.0, 0, 2]), jnp.array([2.0, 0, 0]))
    # winding: normal = cross(b-a, c-a) = cross((0,0,2),(2,0,0)) = (0,4,0) up
    origin = jnp.array([0.5, 3.0, 0.5])
    direc = jnp.array([0.0, -1.0, 0.0])
    t, hit = shapes.ray_triangle(origin, direc, a, b, c)
    assert bool(hit) and abs(float(t) - 3.0) < 1e-6
    # from below with backface culling: no hit
    t2, hit2 = shapes.ray_triangle(jnp.array([0.5, -3.0, 0.5]),
                                   jnp.array([0.0, 1.0, 0.0]), a, b, c)
    assert not bool(hit2)
    # miss outside
    t3, hit3 = shapes.ray_triangle(jnp.array([5.0, 3.0, 5.0]), direc, a, b, c)
    assert not bool(hit3)
