"""Skinned-character rendering (render/charskin.py).

Reference behavior: the vertex shader deforms characters by 4-bone LBS
every draw (model.vert:34-48) using joint transforms uploaded per frame
(model.c:1020-1025). Here the skinned vertices enter the composed frame
as a per-env dynamic record range (cluster path) / vertex-block
substitution (member paths); these tests pin (a) the record math against
a numpy LBS+clip reference, (b) that poses actually move silhouette
pixels through both batched paths and through Engine.frame.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clap_tpu import mathx as mx
from clap_tpu.render.charskin import (build_char_skin,
                                      linear_joint_weights, skin_records)
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.scenerender import (assemble_cluster_records_batch,
                                         build_render_tables,
                                         default_edge_ids,
                                         shadow_static_mask)
from clap_tpu.render.view import make_subview
from clap_tpu.scene import testbed as _tbmod
from clap_tpu.scene.testbed import build_demo_rig, build_testbed

# module-level import would be COLLECTED by pytest (test* name)
_testbed_models = _tbmod.testbed_models
_char_skin = _tbmod.build_testbed_char_skin


def _small():
    n_chars = 2
    tb = build_testbed(seed=42, side=32.0, nr_v=32, n_dynamic=4,
                       max_entities=48, n_chars=n_chars, terrain_chunks=2)
    models = _testbed_models(tb, skinned_chars=True)
    ent = tb.cfg.entities
    edge = default_edge_ids(np.asarray(ent.active),
                            np.asarray(ent.body_is_char))
    rt = build_render_tables(models, np.asarray(ent.model_id),
                             np.asarray(ent.active), entity_edge_id=edge,
                             entity_shadow_static=shadow_static_mask(ent))
    cs = _char_skin(tb, models, rt)
    return tb, models, rt, cs, n_chars


def _rand_joint_mats(rng, B, C, J):
    """Small random rotations + translations per joint (valid LBS input)."""
    out = np.tile(np.eye(4, dtype=np.float32), (B, C, J, 1, 1))
    for b in range(B):
        for c in range(C):
            for j in range(J):
                ang = rng.uniform(-0.5, 0.5)
                ca, sa = np.cos(ang), np.sin(ang)
                out[b, c, j, :3, :3] = np.array(
                    [[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
                out[b, c, j, :3, 3] = rng.uniform(-0.1, 0.1, 3)
    return out


def test_skin_records_match_numpy_reference():
    """comp columns == VP·charmx·LBS(rest) per corner, to fp32 tol."""
    tb, models, rt, cs, C = _small()
    rng = np.random.default_rng(3)
    B, J = 2, 3
    jm = _rand_joint_mats(rng, B, C, J)
    E = tb.cfg.entities.active.shape[0]
    emx = np.tile(np.eye(4, dtype=np.float32), (B, E, 1, 1))
    # give the chars distinct world transforms (yaw + position)
    for b in range(B):
        for k, e in enumerate(np.asarray(cs.char_ents)):
            a = 0.3 * (b + 1) + k
            ca, sa = np.cos(a), np.sin(a)
            emx[b, e, :3, :3] = np.array(
                [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
            emx[b, e, :3, 3] = (k, 0.5, b)
    eye = np.array([[6.0, 5.0, 6.0], [5.0, 4.0, -6.0]], np.float32)
    views = np.stack([np.asarray(mx.mat4_look_at(
        jnp.asarray(e), jnp.zeros(3), jnp.array([0., 1., 0.])))
        for e in eye])
    proj = np.asarray(mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0))
    vis = np.ones((B, E), bool)

    comp, valid, ent_ids, sh_world = jax.jit(
        lambda *a: skin_records(cs, *a))(
        jnp.asarray(jm), jnp.asarray(emx), jnp.asarray(views),
        jnp.asarray(proj), jnp.asarray(vis))
    comp = np.asarray(comp)

    # numpy reference over the char model
    m = models[1]
    v = np.asarray(m.verts, np.float64)
    w, ji = linear_joint_weights(m.verts, np.array([0.0, 0.8, 1.6]))
    f = np.asarray(m.lod_faces[0], np.int64).reshape(-1, 3)
    Tp = cs.n_main
    for b in range(B):
        VP = proj @ views[b]
        for k, e in enumerate(np.asarray(cs.char_ents)):
            # LBS: sum_j w_j * jm_j @ v
            blended = np.zeros((len(v), 3, 4))
            for kk in range(4):
                blended += w[:, kk, None, None] * jm[b, k, ji[:, kk], :3, :]
            s = np.einsum("vij,vj->vi", blended[:, :, :3], v) \
                + blended[:, :, 3]
            world = np.einsum("ij,vj->vi", emx[b, e, :3, :3], s) \
                + emx[b, e, :3, 3]
            clip = np.einsum("ij,vj->vi", VP, np.concatenate(
                [world, np.ones((len(v), 1))], -1))
            for corner in range(3):
                for i in range(4):
                    got = comp[b, corner * 7 + i, k * Tp:k * Tp + len(f)]
                    want = clip[f[:, corner], i]
                    np.testing.assert_allclose(got, want, atol=2e-3,
                                               rtol=1e-4)
    # pad faces are invalid; real faces valid
    valid = np.asarray(valid)
    assert valid[:, :len(f)].all()
    assert not valid[:, len(f):Tp].any()
    # shadow corners are world-space LBS of the coarse LOD
    assert np.isfinite(np.asarray(sh_world)).all()


def _render_once(tb, rt, cs, gss_engine, jmats, skip, opts, proj, lights):
    from clap_tpu.render.camera import camera_view_proj
    from clap_tpu.render.pipeline import render_frame_dynamic_batch

    cam = gss_engine.camera

    def view_of(c):
        q = mx.qmul(mx.quat_from_axis_angle(jnp.array([0., 1., 0.]), c.yaw),
                    mx.quat_from_axis_angle(jnp.array([1., 0., 0.]),
                                            c.pitch))
        return camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]

    views = jax.vmap(view_of)(cam)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    geom, axes = assemble_cluster_records_batch(
        rt, gss_engine.mx, gss_engine.visible, planes, cam.pos, views,
        proj, cap=4096, skip_culling=skip, char_skin=cs, joint_mats=jmats)
    return render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                      lights, cam.pos, far=100.0)


@pytest.mark.slow
def test_cluster_skin_pose_moves_silhouette():
    """The composed cluster-record frame shows the DEFORMING rig: two
    clip times → different silhouette pixels (VERDICT r4 #2 'golden')."""
    from clap_tpu.anim.system import anim_instances_init
    from clap_tpu.engine.game import (GameSessionState, GameWorld,
                                      game_step)
    from clap_tpu.engine.step import inputs_zero
    from clap_tpu.render.pipeline import RenderOptions

    tb, models, rt, cs, n_chars = _small()
    sk, lib, acfg = build_demo_rig()
    gw = GameWorld(scene=tb.cfg, anim=acfg, anim_sk=sk, anim_lib=lib)
    gs1 = GameSessionState(
        engine=tb.state0, anim=anim_instances_init(n_chars),
        joint_mats=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                            (n_chars, 3, 1, 1)))
    B = 2
    gss = jax.tree.map(lambda x: jnp.broadcast_to(x, (B, *x.shape)), gs1)
    ins1 = inputs_zero(n_chars)._replace(
        motion=jnp.zeros((n_chars, 2), jnp.float32).at[0, 0].set(1.0))
    ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (B, *x.shape)), ins1)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    opts = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=False, kernel_attrs=True,
                         record_compact=4096)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    skip = tb.cfg.entities.skip_culling

    step = jax.jit(lambda g, i: jax.vmap(
        lambda s, ii: game_step(gw, s, ii))(g, i))
    rend = jax.jit(lambda e, j: _render_once(tb, rt, cs, e, j, skip, opts,
                                             proj, lights))
    frames = []
    for k in range(12):
        gss = step(gss, ins)
        if k in (0, 6):
            frames.append(np.asarray(rend(gss.engine, gss.joint_mats)))
    a, b = frames
    assert np.isfinite(a).all() and np.isfinite(b).all()
    changed = (np.abs(a - b).max(axis=-1) > 0.02).sum()
    assert changed > 5, f"pose change moved only {changed} pixels"


@pytest.mark.slow
def test_engine_frame_renders_skinned_chars():
    """End-to-end: Engine session + attach_graphics(char_skin=…) — the
    frame loop shows the deforming rig across clip time."""
    from clap_tpu.anim.system import anim_instances_init
    from clap_tpu.engine.core import ClapConfig, Engine
    from clap_tpu.engine.game import GameSessionState, GameWorld
    from clap_tpu.engine.step import inputs_zero
    from clap_tpu.render.pipeline import RenderOptions

    tb, models, rt, cs, n_chars = _small()
    sk, lib, acfg = build_demo_rig()
    gw = GameWorld(scene=tb.cfg, anim=acfg, anim_sk=sk, anim_lib=lib)
    gs0 = GameSessionState(
        engine=tb.state0, anim=anim_instances_init(n_chars),
        joint_mats=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                            (n_chars, 3, 1, 1)))
    eng = Engine(ClapConfig(graphics=True, width=64, height=64),
                 tb.cfg, tb.state0, game_world=gw, session0=gs0)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    eng.attach_graphics(rt, lights,
                        opts=RenderOptions(width=64, height=64,
                                           shadow_size=64, ssao=False,
                                           film_grain=0.0),
                        skip_culling=tb.cfg.entities.skip_culling,
                        char_skin=cs)
    ins = inputs_zero(n_chars)._replace(
        motion=jnp.zeros((n_chars, 2), jnp.float32).at[0, 0].set(1.0))
    frames = []
    for k in range(9):
        eng.frame(ins)
        if k in (1, 8):
            frames.append(np.asarray(eng.last_frame))
    a, b = frames
    assert np.isfinite(a).all()
    changed = (np.abs(a - b).max(axis=-1) > 0.02).sum()
    assert changed > 5, f"Engine.frame silhouette static ({changed} px)"
