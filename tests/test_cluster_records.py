"""Cluster-record batched assembly (assemble_cluster_records_batch):
the composed path's record front end at cluster granularity.

Checks:
- build_render_tables pads face blocks to CLUSTER multiples and the
  cluster tables are (entity, LOD)-pure;
- the emitted record SET matches a numpy replication of the member
  path's validity + clip transform (behind-camera entities emit zero
  records — the member path's garbage-pad records never pass validity);
- full-frame image parity vs the member-granularity kernel_attrs path
  through render_frame_dynamic_batch (fp-order tolerance: the cluster
  path folds world+clip into ONE 4x4 per entity).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render.camera import camera_view_proj
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import (RenderOptions,
                                      render_frame_dynamic_batch)
from clap_tpu.render.raster import CLUSTER
from clap_tpu.render.scenerender import (assemble_cluster_records_batch,
                                         assemble_scene_geometry_batch,
                                         build_render_tables,
                                         default_edge_ids,
                                         kernel_attrs_ok)
from clap_tpu.render.view import make_subview
from clap_tpu.scene.testbed import build_testbed
from clap_tpu.scene import testbed as _tbmod

# direct import would be collected as a test (test* name glob)
_testbed_models = _tbmod.testbed_models


def _setup(B=2):
    tb = build_testbed(seed=42, side=64.0, nr_v=32, n_dynamic=4,
                       max_entities=32, n_chars=1, terrain_chunks=2)
    models = _testbed_models(tb)
    ent = tb.cfg.entities
    edge = default_edge_ids(np.asarray(ent.active),
                            np.asarray(ent.body_is_char))
    rt = build_render_tables(models, np.asarray(ent.model_id),
                             np.asarray(ent.active), entity_edge_id=edge)
    st = tb.state0
    c = st.camera
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)
    q = mx.qmul(mx.quat_from_axis_angle(jnp.array([0., 1, 0]), c.yaw),
                mx.quat_from_axis_angle(jnp.array([1., 0, 0]), c.pitch))
    view = camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]
    sv = make_subview(view, proj)
    bmx = jnp.broadcast_to(st.mx, (B, *st.mx.shape))
    # env 1 differs: nudge dynamic entity transforms so the batch is
    # not a pure broadcast
    if B > 1:
        bump = jnp.zeros_like(bmx).at[1, :, 0, 3].set(0.35)
        bmx = bmx + bump
    bvis = jnp.broadcast_to(st.visible, (B, *st.visible.shape))
    bplanes = jnp.broadcast_to(sv.planes, (B, *sv.planes.shape))
    beyes = jnp.broadcast_to(c.pos, (B, 3))
    views = jnp.broadcast_to(view, (B, 4, 4))
    return tb, rt, proj, views, bplanes, bmx, bvis, beyes


def test_cluster_tables_pure():
    _, rt, *_ = _setup(B=1)
    assert rt.cl_rest is not None and rt.cl_entity is not None
    T = rt.faces.shape[0]
    assert T % CLUSTER == 0
    Tc = T // CLUSTER
    assert rt.cl_entity.shape == (Tc,)
    assert rt.cl_rest.shape == (Tc, 18 * CLUSTER)
    # cluster purity: member rows agree with the cluster tables
    fe = np.asarray(rt.face_entity).reshape(Tc, CLUSTER)
    assert (fe == np.asarray(rt.cl_entity)[:, None]).all()
    fl = np.asarray(rt.face_lod).reshape(Tc, CLUSTER)
    assert (fl == np.asarray(rt.cl_lod)[:, None]).all()
    # rest rows reproduce the vertex fetch: corner 0 x-component
    verts = np.asarray(rt.verts)
    faces = np.asarray(rt.faces)
    rows = np.asarray(rt.cl_rest).reshape(Tc, 18, CLUSTER)
    np.testing.assert_allclose(rows[:, 0, :].reshape(-1),
                               verts[faces[:, 0], 0], atol=0)
    np.testing.assert_allclose(rows[:, 6 + 1, :].reshape(-1),
                               verts[faces[:, 1], 1], atol=0)
    # shadow corner stream: v0, v2, v1 record order
    sf = np.asarray(rt.shadow_faces)
    sc = np.asarray(rt.shadow_corner_rest)
    np.testing.assert_allclose(
        sc, verts[sf[:, [0, 2, 1]].reshape(-1)], atol=0)


@pytest.mark.slow
def test_cluster_record_set_matches_member_path():
    """The record SETS agree (compaction reorders): canonicalize valid
    records by (entity, corner geometry) and compare columns."""
    from clap_tpu.render.pipeline import clip_transform
    from clap_tpu.render.raster import clip_near_records, ent_pack_stride

    tb, rt, proj, views, bplanes, bmx, bvis, beyes = _setup(B=1)
    ent = tb.cfg.entities
    W = H = 256
    E = bmx.shape[1]
    stride = ent_pack_stride(E)
    T_all = rt.faces.shape[0]

    geom_o, _ = assemble_scene_geometry_batch(
        rt, bmx, bvis, bplanes, beyes, skip_culling=ent.skip_culling)

    def old_records(verts, fv, vw):
        clip = clip_transform(verts, vw, proj)
        return clip_near_records(clip, rt.faces, W, H, fv,
                                 vextra=rt.normals,
                                 tid_pack=rt.face_entity,
                                 pack_stride=stride)[:2]

    rec_o, ok_o = jax.jit(jax.vmap(old_records))(
        geom_o.verts, geom_o.face_valid, views)

    # cluster_cull=False: the cull drops clusters whose records are
    # dead-or-fragmentless anyway — record SET equality needs it off
    # (test_cluster_cull_image_identical covers the cull)
    geom_n, _ = assemble_cluster_records_batch(
        rt, bmx, bvis, bplanes, beyes, views, proj, cap=T_all,
        skip_culling=ent.skip_culling, cluster_cull=False)

    def new_records(comp, cv, ce):
        comps = [[comp[c * 7 + i] for i in range(7)] for c in range(3)]
        return clip_near_records(None, None, W, H, cv, tid_pack=ce,
                                 pack_stride=stride, components=comps)[:2]

    rec_n, ok_n = jax.jit(jax.vmap(new_records))(
        geom_n.comp, geom_n.comp_valid, geom_n.comp_ent)

    def canon(rec, ok):
        r = np.asarray(rec)[0][:, np.asarray(ok)[0]]
        ent_id = np.mod(r[12], stride)
        key = np.stack([ent_id, r[0], r[1], r[2], r[4], r[5]], -1)
        idx = np.lexsort(key.T[::-1])
        return r[:, idx], ent_id[idx]

    co, eo = canon(rec_o, ok_o)
    cn, en = canon(rec_n, ok_n)
    assert co.shape == cn.shape, (co.shape, cn.shape)
    assert (eo == en).all()
    geom_cols = list(range(12)) + list(range(13, rec_o.shape[1]))
    d = np.abs(co[geom_cols] - cn[geom_cols])
    assert d.max() < 2e-2, d.max()   # fp order: folded 4x4 vs 2-stage


@pytest.mark.slow
def test_cluster_image_parity():
    tb, rt, proj, views, bplanes, bmx, bvis, beyes = _setup(B=2)
    ent = tb.cfg.entities
    assert kernel_attrs_ok(rt)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    opts = RenderOptions(width=96, height=96, shadow_size=64,
                         film_grain=0.0, ssao=False, kernel_attrs=True)

    geom_o, axes_o = assemble_scene_geometry_batch(
        rt, bmx, bvis, bplanes, beyes, skip_culling=ent.skip_culling)
    i_o = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        opts, g, axes_o, v, proj, lights, e, far=200.0))(
            geom_o, views, beyes)

    geom_n, axes_n = assemble_cluster_records_batch(
        rt, bmx, bvis, bplanes, beyes, views, proj,
        cap=rt.faces.shape[0], skip_culling=ent.skip_culling)
    i_n = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        opts, g, axes_n, v, proj, lights, e, far=200.0))(
            geom_n, views, beyes)

    diff = np.abs(np.asarray(i_n) - np.asarray(i_o))
    # fp-order differences flip coverage only on silhouette pixels
    assert diff.mean() < 2e-3, diff.mean()
    assert np.quantile(diff, 0.999) < 0.2, np.quantile(diff, 0.999)
    assert np.asarray(i_n).std() > 0.01      # content rendered


def test_cluster_cull_image_identical():
    """The per-cluster frustum cull only removes clusters that produce
    no fragments (conservative p-vertex AABB test), so the rendered
    image is BIT-identical with it on/off — and it must actually cull
    something on the testbed (offscreen terrain sub-chunks)."""
    tb, rt, proj, views, bplanes, bmx, bvis, beyes = _setup(B=1)
    ent = tb.cfg.entities
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    opts = RenderOptions(width=96, height=96, shadow_size=64,
                         film_grain=0.0, ssao=False, kernel_attrs=True)
    imgs = {}
    nval = {}
    for cull in (False, True):
        geom, axes = assemble_cluster_records_batch(
            rt, bmx, bvis, bplanes, beyes, views, proj,
            cap=rt.faces.shape[0], skip_culling=ent.skip_culling,
            cluster_cull=cull)
        nval[cull] = int(np.asarray(geom.comp_valid).sum())
        imgs[cull] = np.asarray(jax.jit(
            lambda g: render_frame_dynamic_batch(
                opts, g, axes, views, proj, lights, beyes, far=200.0))(
                    geom))
    assert nval[True] < nval[False], nval
    np.testing.assert_array_equal(imgs[True], imgs[False])


def test_cluster_cap_compaction():
    """With cap smaller than the stream, valid clusters are kept first
    and the image is unchanged when the cap still covers every valid
    cluster."""
    tb, rt, proj, views, bplanes, bmx, bvis, beyes = _setup(B=1)
    ent = tb.cfg.entities
    geom_full, _ = assemble_cluster_records_batch(
        rt, bmx, bvis, bplanes, beyes, views, proj,
        cap=rt.faces.shape[0], skip_culling=ent.skip_culling)
    nvalid = int(np.asarray(geom_full.comp_valid).sum())
    cap = ((nvalid + CLUSTER - 1) // CLUSTER + 2) * CLUSTER
    geom_cap, _ = assemble_cluster_records_batch(
        rt, bmx, bvis, bplanes, beyes, views, proj, cap=cap,
        skip_culling=ent.skip_culling)
    assert int(np.asarray(geom_cap.comp_valid).sum()) == nvalid
    # valid entries reference the same (entity, corner-0) multiset
    def keyset(g):
        cv = np.asarray(g.comp_valid)[0]
        ce = np.asarray(g.comp_ent)[0][cv]
        x0 = np.asarray(g.comp)[0][0][cv]
        return sorted(zip(ce.tolist(), x0.tolist()))
    assert keyset(geom_full) == keyset(geom_cap)
