"""Animation stack tests: channel sampling, hierarchy, skinning, queue —
against scalar numpy references mirroring the C algorithms."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu.anim.clips import (AnimLibrary, Pose, PATH_ROTATION,
                                 PATH_SCALE, PATH_TRANSLATION,
                                 build_library, sample_pose)
from clap_tpu.anim.joints import build_skeleton, joint_matrices, global_matrices, local_matrices
from clap_tpu.anim.skin import skin_verts
from clap_tpu.anim.queue import queue_init, queue_push, queue_advance
from clap_tpu import mathx as mx


def make_rig():
    """3-joint chain."""
    J = 3
    parent = [-1, 0, 1]
    invbind = np.stack([np.eye(4, dtype=np.float32)] * J)
    base_t = np.array([[0, 0, 0], [0, 1, 0], [0, 1, 0]], np.float32)
    base_r = np.tile(np.array([0, 0, 0, 1], np.float32), (J, 1))
    base_s = np.ones((J, 3), np.float32)
    return build_skeleton(parent, invbind, base_t, base_r, base_s)


def test_channel_sampling_lerp():
    # translation channel on joint 1: moves 0→(2,0,0) over 1s
    clips = [[(1, PATH_TRANSLATION, [0.0, 1.0], [[0, 0, 0], [2, 0, 0]])]]
    lib = build_library(clips, 3)
    sk = make_rig()
    pose = sample_pose(lib, sk.base, jnp.int32(0), jnp.float32(0.25))
    np.testing.assert_allclose(np.asarray(pose.trans[1]), [0.5, 0, 0], atol=1e-6)
    # other joints keep base
    np.testing.assert_allclose(np.asarray(pose.trans[2]), [0, 1, 0], atol=1e-6)
    # clamped beyond the end (model.c:1303-1307)
    pose = sample_pose(lib, sk.base, jnp.int32(0), jnp.float32(5.0))
    np.testing.assert_allclose(np.asarray(pose.trans[1]), [2, 0, 0], atol=1e-6)


def test_channel_sampling_slerp():
    q0 = np.array([0, 0, 0, 1], np.float32)
    q1 = np.asarray(mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                            jnp.float32(np.pi / 2)))
    clips = [[(0, PATH_ROTATION, [0.0, 2.0], [q0, q1])]]
    lib = build_library(clips, 3)
    sk = make_rig()
    pose = sample_pose(lib, sk.base, jnp.int32(0), jnp.float32(1.0))
    expect = np.asarray(mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                                jnp.float32(np.pi / 4)))
    got = np.asarray(pose.rot[0])
    sign = np.sign(got @ expect)
    np.testing.assert_allclose(got * sign, expect, atol=1e-5)


def test_hierarchy_chain():
    sk = make_rig()
    # bend joint 1 by 90° about z: joint 2 ends up at (−1, 1, 0)
    rot = mx.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    pose = Pose(trans=sk.base.trans,
                rot=sk.base.rot.at[1].set(rot),
                scale=sk.base.scale)
    glob = global_matrices(sk, local_matrices(pose))
    tip = np.asarray(glob[2][:3, 3])
    np.testing.assert_allclose(tip, [-1, 1, 0], atol=1e-5)


def test_joint_matrices_with_invbind():
    sk = make_rig()
    # bind pose: joint matrices should be identity when invbind = inv(global_rest)
    glob_rest = global_matrices(sk, local_matrices(sk.base))
    invbind = jnp.linalg.inv(glob_rest)
    sk2 = sk._replace(invbind=invbind)
    jt = joint_matrices(sk2, sk.base)
    np.testing.assert_allclose(np.asarray(jt),
                               np.tile(np.eye(4), (3, 1, 1)), atol=1e-5)


def test_skinning_rigid_follow():
    sk = make_rig()
    rot = mx.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    pose = Pose(trans=sk.base.trans, rot=sk.base.rot.at[0].set(rot),
                scale=sk.base.scale)
    glob_rest = global_matrices(sk, local_matrices(sk.base))
    sk2 = sk._replace(invbind=jnp.linalg.inv(glob_rest))
    jt = joint_matrices(sk2, pose)
    # vertex rigidly bound to joint 0 at (1, 0, 0) rotates to (0, 1, 0)
    verts = jnp.array([[1.0, 0.0, 0.0]])
    normals = jnp.array([[1.0, 0.0, 0.0]])
    w = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    ji = jnp.zeros((1, 4), jnp.int32)
    sv, sn = skin_verts(jt, verts, normals, w, ji)
    np.testing.assert_allclose(np.asarray(sv[0]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sn[0]), [0, 1, 0], atol=1e-5)


def test_skinning_blend():
    # two joints: identity and +2x translation; 50/50 blend moves +1x
    jt = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(2.0)]).astype(jnp.float32)
    verts = jnp.array([[0.0, 0.0, 0.0]])
    w = jnp.array([[0.5, 0.5, 0.0, 0.0]])
    ji = jnp.array([[0, 1, 0, 0]], jnp.int32)
    sv, _ = skin_verts(jt, verts, verts, w, ji)
    np.testing.assert_allclose(np.asarray(sv[0]), [1, 0, 0], atol=1e-6)


def test_queue_lifecycle():
    durations = jnp.array([1.0, 2.0], jnp.float32)
    q = queue_init()
    q = queue_push(q, 0, jnp.array(False), jnp.array(True))   # play clip 0
    q = queue_push(q, 1, jnp.array(True), jnp.array(False))   # then loop clip 1
    # advance 0.6s: still clip 0
    q, ended, active = queue_advance(q, durations, jnp.float32(0.6))
    assert int(q.clip[0]) == 0 and not bool(ended)
    # advance 0.6s: clip 0 ends, clip 1 becomes current
    q, ended, active = queue_advance(q, durations, jnp.float32(0.6))
    assert bool(ended) and int(q.clip[0]) == 1
    # looping clip wraps
    for _ in range(10):
        q, ended, active = queue_advance(q, durations, jnp.float32(0.7))
    assert int(q.clip[0]) == 1 and not bool(ended)
    assert 0.0 <= float(q.time) < 2.0


def test_batched_pose_sampling():
    """1024 instances sampling different times — the benchmark #3 shape."""
    clips = [[(j, PATH_ROTATION, [0.0, 1.0],
               [[0, 0, 0, 1], [0, 0.7071, 0, 0.7071]]) for j in range(3)],
             [(1, PATH_TRANSLATION, [0.0, 1.0], [[0, 0, 0], [0, 2, 0]])]]
    lib = build_library(clips, 3)
    sk = make_rig()
    ts = jnp.linspace(0, 1, 64)
    ids = jnp.tile(jnp.array([0, 1]), 32)
    poses = jax.vmap(lambda i, t: sample_pose(lib, sk.base, i, t))(ids, ts)
    assert poses.trans.shape == (64, 3, 3)
    jts = jax.vmap(lambda p: joint_matrices(sk, p))(poses)
    assert jts.shape == (64, 3, 4, 4)


def test_skin_verts_batch_matches_vmapped_single():
    # the single-contraction batched LBS must agree with vmapped
    # skin_verts exactly (same math, different MXU layout)
    from clap_tpu.anim.skin import skin_verts_batch

    rng = np.random.default_rng(3)
    B, J, V = 5, 7, 33
    # random affine joint mats (rotation-ish + translation)
    jts = np.tile(np.eye(4, dtype=np.float32), (B, J, 1, 1))
    jts[:, :, :3, :3] += rng.standard_normal((B, J, 3, 3)).astype(np.float32) * 0.3
    jts[:, :, :3, 3] = rng.standard_normal((B, J, 3)).astype(np.float32)
    verts = rng.standard_normal((V, 3)).astype(np.float32)
    normals = rng.standard_normal((V, 3)).astype(np.float32)
    w = rng.random((V, 4)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    ji = rng.integers(0, J, (V, 4)).astype(np.int32)

    jts_j = jnp.asarray(jts)
    sv_ref, sn_ref = jax.vmap(
        lambda jt: skin_verts(jt, jnp.asarray(verts), jnp.asarray(normals),
                              jnp.asarray(w), jnp.asarray(ji)))(jts_j)
    sv, sn = skin_verts_batch(jts_j, jnp.asarray(verts),
                              jnp.asarray(normals), jnp.asarray(w),
                              jnp.asarray(ji))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(sv_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sn), np.asarray(sn_ref),
                               atol=1e-4, rtol=1e-4)
