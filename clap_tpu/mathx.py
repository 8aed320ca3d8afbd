"""Vector / quaternion / mat4 math for the batched engine.

Re-provides the semantics of the reference's linmath.h (core/linmath.h) and
transform.c (core/transform.{c,h}) as pure jnp functions that broadcast over
arbitrary leading batch axes. Conventions:

- Quaternions are ``[x, y, z, w]`` Hamilton quaternions (linmath.h:835-928,
  also the glTF convention).
- Matrices are ``(..., 4, 4)`` arrays acting on column vectors: ``M @ v``.
  The reference stores column-major ``M[col][row]`` (linmath.h mat4x4); a
  linmath matrix printed as C memory equals our transpose, but the *math* is
  identical — translation lives in our ``M[:3, 3]``.
- Euler angles follow quat_from_euler_xyz (linmath.h:856-870).

Everything is float32 by default; pass f64 inputs to get f64 out (tests use
numpy f64 references).
"""
from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# vec3 helpers
# ---------------------------------------------------------------------------

def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def length(v, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims))


def normalize(v, eps=0.0):
    """vec*_norm: v / |v|. With eps>0, returns 0 for near-zero vectors."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    if eps:
        safe = jnp.where(n2 > eps * eps, n2, 1.0)
        return jnp.where(n2 > eps * eps, v / jnp.sqrt(safe), jnp.zeros_like(v))
    return v / jnp.sqrt(n2)


def cross(a, b):
    return jnp.cross(a, b)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def lerp(a, b, t):
    """lin*_interp (interp.h DEFINE_LIN_INTERP)."""
    return a * (1.0 - t) + b * t


def cos_interp(a, b, t):
    """cosf_interp (interp.h DEFINE_COS_INTERP)."""
    f = (1.0 - jnp.cos(t * jnp.pi)) / 2.0
    return a * (1.0 - f) + b * f


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def barycentric(p1, p2, p3, pos):
    """Height interpolation inside a triangle (interp.h:49; terrain_height).

    p1/p2/p3 are (...,3) [x, height, z] triangle corners, pos is (...,2) x/z.
    """
    det = (p2[..., 2] - p3[..., 2]) * (p1[..., 0] - p3[..., 0]) + (
        p3[..., 0] - p2[..., 0]
    ) * (p1[..., 2] - p3[..., 2])
    l1 = (
        (p2[..., 2] - p3[..., 2]) * (pos[..., 0] - p3[..., 0])
        + (p3[..., 0] - p2[..., 0]) * (pos[..., 1] - p3[..., 2])
    ) / det
    l2 = (
        (p3[..., 2] - p1[..., 2]) * (pos[..., 0] - p3[..., 0])
        + (p1[..., 0] - p3[..., 0]) * (pos[..., 1] - p3[..., 2])
    ) / det
    l3 = 1.0 - l1 - l2
    return l1 * p1[..., 1] + l2 * p2[..., 1] + l3 * p3[..., 1]


# ---------------------------------------------------------------------------
# quaternions — [x, y, z, w]
# ---------------------------------------------------------------------------

QUAT_ID = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def qidentity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.array([0, 0, 0, 1], dtype=dtype), (*shape, 4))


def qmul(p, q):
    """quat_mul (linmath.h:899-908): Hamilton product r = p*q."""
    px, py, pz, pw = (p[..., i] for i in range(4))
    qx, qy, qz, qw = (q[..., i] for i in range(4))
    return jnp.stack(
        [
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
            pw * qw - px * qx - py * qy - pz * qz,
        ],
        axis=-1,
    )


def qconj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def qrot(q, v):
    """quat_mul_vec3 (linmath.h:939-957): rotate v by q (ryg's method)."""
    qv = q[..., :3]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., 3:4] * t + jnp.cross(qv, t)


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_from_axis_angle(axis, angle):
    """quat_from_axis_angle (linmath.h:841-855). axis (...,3), angle (...)."""
    angle = jnp.asarray(angle)
    l2 = jnp.sum(axis * axis, axis=-1)
    half = angle * 0.5
    scale = jnp.where(l2 > 0, jnp.sin(half) / jnp.sqrt(jnp.where(l2 > 0, l2, 1.0)), 0.0)
    xyz = axis * scale[..., None]
    w = jnp.where(l2 > 0, jnp.cos(half), 1.0)
    return jnp.concatenate([xyz, w[..., None]], axis=-1)


def quat_from_euler_xyz(x, y, z):
    """quat_from_euler_xyz (linmath.h:856-870)."""
    cx, sx = jnp.cos(x * 0.5), jnp.sin(x * 0.5)
    cy, sy = jnp.cos(y * 0.5), jnp.sin(y * 0.5)
    cz, sz = jnp.cos(z * 0.5), jnp.sin(z * 0.5)
    return jnp.stack(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q):
    """quat_to_euler_xyz (linmath.h:871-887). Returns (x, y, z)."""
    qx, qy, qz, qw = (q[..., i] for i in range(4))
    x = jnp.arctan2(2.0 * (qw * qx + qy * qz), 1.0 - 2.0 * (qx * qx + qy * qy))
    sinp = 2.0 * (qw * qy - qz * qx)
    y = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )
    z = jnp.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    return x, y, z


def qslerp(a, b, t):
    """Shortest-arc slerp with lerp fallback for near-parallel quats
    (model.c:1290-1342 channel rotation path)."""
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(d < 0, -b, b)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    # guarded slerp weights
    st = jnp.where(use_lerp, 1.0, sin_theta)
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / st)
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / st)
    return qnormalize(w0 * a + w1 * b)


def mat3_from_quat(q):
    """Rotation part of mat4x4_from_quat (linmath.h:959-991), (...,3,3)."""
    x, y, z, w = (q[..., i] for i in range(4))
    x2, y2, z2, w2 = x * x, y * y, z * z, w * w
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), w2 - x2 + y2 - z2, 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def quat_from_mat3(m):
    """Robust rotation-matrix → quaternion (Shepperd's method), (...,3,3)→(...,4).

    Branch-free: computes all four candidate solutions and selects by the
    largest pivot. Replaces quat_from_mat4x4 (linmath.h:999-1027).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(x, y, z, w):
        return jnp.stack([x, y, z, w], axis=-1)

    # candidate from trace
    sw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    qw = mk((m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw)
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = mk(0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx)
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = mk((m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy)
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = mk((m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz)

    cond_w = tr > 0.0
    cond_x = (m00 > m11) & (m00 > m22)
    cond_y = m11 > m22
    q = jnp.where(
        cond_w[..., None],
        qw,
        jnp.where(cond_x[..., None], qx, jnp.where(cond_y[..., None], qy, qz)),
    )
    return qnormalize(q)


# ---------------------------------------------------------------------------
# mat4 — (..., 4, 4), column-vector convention
# ---------------------------------------------------------------------------

def mat4_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), (*shape, 4, 4))


def mat4_from_quat(q):
    """mat4x4_from_quat (linmath.h:959-991)."""
    r3 = mat3_from_quat(q)
    m = mat4_identity(q.shape[:-1], q.dtype)
    return m.at[..., :3, :3].set(r3)


def mat4_translate(v):
    m = mat4_identity(v.shape[:-1], v.dtype)
    return m.at[..., :3, 3].set(v)


def mat4_scale_aniso(s):
    """Diagonal scale; s is (...,3)."""
    m = mat4_identity(s.shape[:-1], s.dtype)
    return m.at[..., 0, 0].set(s[..., 0]).at[..., 1, 1].set(s[..., 1]).at[
        ..., 2, 2
    ].set(s[..., 2])


def mat4_compose_trs(pos, rot_q, scale):
    """T * R * S as built by entity3d default_update (model.c:1670-1676):
    translate, rotate by quat, uniform-or-aniso scale. pos (...,3),
    rot_q (...,4), scale (...,) or (...,3)."""
    scale = jnp.asarray(scale)
    if scale.shape == () or scale.shape[-1:] != (3,):
        scale = jnp.broadcast_to(scale[..., None], (*scale.shape, 3))
    r = mat3_from_quat(rot_q) * scale[..., None, :]
    m = mat4_identity(pos.shape[:-1], pos.dtype)
    m = m.at[..., :3, :3].set(r)
    return m.at[..., :3, 3].set(pos)


def mat4_mul(a, b):
    return a @ b


def mat4_mul_vec4(m, v):
    return jnp.einsum("...ij,...j->...i", m, v)


def mat4_transform_point(m, p):
    """Apply mat4 to a (...,3) point (w=1)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def mat4_transform_dir(m, d):
    """Apply mat4 rotation/scale part to a (...,3) direction (w=0)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], d)


def mat4_inverse_rigid(m):
    """Fast inverse for rigid(+uniform scale) TRS matrices.

    Handles the general 3x3 via explicit inverse so non-uniform scale also
    works (entity3d keeps inverse_mx for lighting, model.c:1677)."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    r_inv = jnp.linalg.inv(r)
    m_out = mat4_identity(m.shape[:-2], m.dtype)
    m_out = m_out.at[..., :3, :3].set(r_inv)
    return m_out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", r_inv, t))


def mat4_look_at(eye, center, up):
    """mat4x4_look_at (linmath.h): right-handed view matrix."""
    f = normalize(center - eye)
    s = normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    batch = eye.shape[:-1]
    m = mat4_identity(batch, eye.dtype)
    m = m.at[..., 0, :3].set(s)
    m = m.at[..., 1, :3].set(u)
    m = m.at[..., 2, :3].set(-f)
    m = m.at[..., 0, 3].set(-dot(s, eye))
    m = m.at[..., 1, 3].set(-dot(u, eye))
    m = m.at[..., 2, 3].set(dot(f, eye))
    return m


def mat4_look_at_safe(eye, center, up):
    """mat4x4_look_at_safe (linmath.h:818-833): falls back to (0,0,-1) up
    when forward ~ parallel to up."""
    f = normalize(center - eye)
    dp = jnp.abs(dot(f, normalize(up)))[..., None]
    alt = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], dtype=eye.dtype), up.shape
    )
    up_adj = jnp.where(dp > 0.999, alt, up)
    return mat4_look_at(eye, center, up_adj)


def mat4_perspective(fovy, aspect, near, far):
    """GL-style perspective projection (linmath.h mat4x4_perspective),
    z in [-1, 1] NDC. Scalars or broadcastable arrays."""
    fovy = jnp.asarray(fovy, dtype=jnp.float32)
    a = 1.0 / jnp.tan(fovy / 2.0)
    batch = jnp.broadcast_shapes(
        jnp.shape(fovy), jnp.shape(aspect), jnp.shape(near), jnp.shape(far)
    )
    m = jnp.zeros((*batch, 4, 4), dtype=jnp.float32)
    m = m.at[..., 0, 0].set(a / aspect)
    m = m.at[..., 1, 1].set(a)
    m = m.at[..., 2, 2].set(-(far + near) / (far - near))
    m = m.at[..., 2, 3].set(-2.0 * far * near / (far - near))
    m = m.at[..., 3, 2].set(-1.0)
    return m


def mat4_ortho(l, r, b, t, n, f):
    """GL-style orthographic projection (linmath.h mat4x4_ortho)."""
    shapes = [jnp.shape(x) for x in (l, r, b, t, n, f)]
    batch = jnp.broadcast_shapes(*shapes)
    l, r, b, t, n, f = (jnp.asarray(x, dtype=jnp.float32) for x in (l, r, b, t, n, f))
    m = jnp.zeros((*batch, 4, 4), dtype=jnp.float32)
    m = m.at[..., 0, 0].set(2.0 / (r - l))
    m = m.at[..., 1, 1].set(2.0 / (t - b))
    m = m.at[..., 2, 2].set(-2.0 / (f - n))
    m = m.at[..., 0, 3].set(-(r + l) / (r - l))
    m = m.at[..., 1, 3].set(-(t + b) / (t - b))
    m = m.at[..., 2, 3].set(-(f + n) / (f - n))
    m = m.at[..., 3, 3].set(1.0)
    return m


# ---------------------------------------------------------------------------
# transform — pos + rotation quat (transform.{c,h})
# ---------------------------------------------------------------------------

def transform_view_mat4(pos, rot_q):
    """transform_view_mat4x4 (transform.c:131-138): R^T then translate by
    -pos — the camera view matrix from camera pos + orientation quat."""
    r = mat3_from_quat(rot_q)
    rt = jnp.swapaxes(r, -1, -2)
    m = mat4_identity(pos.shape[:-1], pos.dtype)
    m = m.at[..., :3, :3].set(rt)
    return m.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rt, pos))


def transform_orbit(rot_q, target, dist):
    """transform_orbit (transform.c:117-124): camera position at
    target + R*(0,0,dist)."""
    d = jnp.asarray(dist)
    start = jnp.stack(
        [jnp.zeros_like(d), jnp.zeros_like(d), d], axis=-1
    )
    return target + qrot(rot_q, start)
