"""Math library golden tests vs independent numpy references."""
import numpy as np
import jax.numpy as jnp
import pytest

from clap_tpu import mathx as mx


def rand_quat(rng, n=()):
    q = rng.standard_normal((*n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat_np(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def test_qmul_matches_matrix_composition():
    rng = np.random.default_rng(0)
    p, q = rand_quat(rng, (32,)), rand_quat(rng, (32,))
    m = quat_to_mat_np(np.asarray(mx.qmul(p, q)))
    m_ref = quat_to_mat_np(p) @ quat_to_mat_np(q)
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


def test_qrot_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, (32,))
    v = rng.standard_normal((32, 3))
    got = np.asarray(mx.qrot(q, v))
    ref = np.einsum("nij,nj->ni", quat_to_mat_np(q), v)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_mat3_from_quat():
    rng = np.random.default_rng(2)
    q = rand_quat(rng, (8,))
    np.testing.assert_allclose(np.asarray(mx.mat3_from_quat(q)), quat_to_mat_np(q), atol=1e-6)


def test_quat_from_mat3_roundtrip():
    rng = np.random.default_rng(3)
    q = rand_quat(rng, (64,))
    q2 = np.asarray(mx.quat_from_mat3(mx.mat3_from_quat(q)))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.default_rng(4)
    ang = rng.uniform(-1.2, 1.2, (16, 3))  # inside gimbal-safe range
    q = mx.quat_from_euler_xyz(ang[:, 0], ang[:, 1], ang[:, 2])
    x, y, z = mx.quat_to_euler_xyz(q)
    np.testing.assert_allclose(np.stack([x, y, z], -1), ang, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(5)
    a, b = rand_quat(rng, (8,)), rand_quat(rng, (8,))
    np.testing.assert_allclose(np.asarray(mx.qslerp(a, b, 0.0)), a, atol=1e-6)
    got_b = np.asarray(mx.qslerp(a, b, 1.0))
    sign = np.sign(np.sum(b * got_b, axis=-1, keepdims=True))
    np.testing.assert_allclose(got_b * sign, b, atol=1e-6)
    # midpoint is unit and equidistant
    m = np.asarray(mx.qslerp(a, b, 0.5))
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-6)
    da = np.abs(np.sum(m * a, -1))
    db = np.abs(np.sum(m * b, -1))
    np.testing.assert_allclose(da, db, atol=1e-5)


def test_compose_trs_and_inverse():
    rng = np.random.default_rng(6)
    pos = rng.standard_normal((8, 3))
    q = rand_quat(rng, (8,))
    s = rng.uniform(0.5, 2.0, (8,))
    m = mx.mat4_compose_trs(pos, q, s)
    minv = mx.mat4_inverse_rigid(m)
    np.testing.assert_allclose(np.asarray(m @ minv), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4)
    # M applied to origin = pos
    np.testing.assert_allclose(
        np.asarray(mx.mat4_transform_point(m, jnp.zeros((8, 3)))), pos, atol=1e-5
    )


def test_view_matrix_places_eye_at_origin():
    rng = np.random.default_rng(7)
    pos = rng.standard_normal((8, 3)).astype(np.float32)
    q = rand_quat(rng, (8,)).astype(np.float32)
    v = mx.transform_view_mat4(pos, q)
    np.testing.assert_allclose(np.asarray(mx.mat4_transform_point(v, pos)), 0, atol=1e-5)


def test_look_at_forward_maps_to_minus_z():
    eye = jnp.array([1.0, 2.0, 3.0])
    center = jnp.array([4.0, 2.0, 3.0])
    up = jnp.array([0.0, 1.0, 0.0])
    m = mx.mat4_look_at(eye, center, up)
    p = mx.mat4_transform_point(m, center)
    np.testing.assert_allclose(np.asarray(p), [0, 0, -3], atol=1e-5)


def test_perspective_matches_gl():
    m = np.asarray(mx.mat4_perspective(np.pi / 3, 16 / 9, 0.1, 100.0))
    f = 1.0 / np.tan(np.pi / 6)
    assert abs(m[0, 0] - f / (16 / 9)) < 1e-5
    assert abs(m[1, 1] - f) < 1e-5
    assert abs(m[3, 2] + 1.0) < 1e-6
    # near plane maps to -1, far to +1
    for z, ndc in ((-0.1, -1.0), (-100.0, 1.0)):
        v = m @ np.array([0, 0, z, 1.0])
        assert abs(v[2] / v[3] - ndc) < 1e-4


def test_orbit():
    # identity rotation: camera sits at target + (0,0,len)
    q = mx.qidentity((1,))
    pos = mx.transform_orbit(q, jnp.array([[1.0, 2.0, 3.0]]), 5.0)
    np.testing.assert_allclose(np.asarray(pos), [[1, 2, 8]], atol=1e-6)


def test_barycentric_planar():
    # height field z = 2x + 3z0 + 1 over the unit triangle
    p1 = jnp.array([0.0, 1.0, 0.0])
    p2 = jnp.array([1.0, 3.0, 0.0])
    p3 = jnp.array([0.0, 4.0, 1.0])
    pos = jnp.array([0.25, 0.25])
    h = mx.barycentric(p1, p2, p3, pos)
    assert abs(float(h) - (2 * 0.25 + 3 * 0.25 + 1)) < 1e-5
