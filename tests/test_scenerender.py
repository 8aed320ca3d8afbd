"""Engine-state → renderer glue: instancing, culling, LOD selection."""
import numpy as np
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render.scenerender import (LOD_DISTANCES, ModelData,
                                         assemble_scene_geometry,
                                         build_render_tables,
                                         model_from_mesh)
from clap_tpu.render.view import make_subview
from clap_tpu.scene.primitives import cube


def make_tables():
    v, n, uv, f = cube(1.0)
    m = model_from_mesh(v, n, f, with_lods=False)
    entity_model = np.array([0, 0, 0], np.int32)
    active = np.array([True, True, False])
    return build_render_tables([m], entity_model, active)


def test_instancing_shapes():
    rt = make_tables()
    assert rt.verts.shape[0] == 48          # 2 active instances × 24
    # 2 × 12 tris, each block CLUSTER-padded to 16 with degenerate
    # (v, v, v) faces (cluster-record purity; test_cluster_records)
    assert rt.faces.shape[0] == 32
    assert int(rt.face_entity.max()) == 1
    # shadow stream excludes the pads
    assert rt.shadow_faces.shape[0] == 24


def test_transform_and_cull():
    rt = make_tables()
    # entity 0 at origin, entity 1 far left out of view
    mx0 = mx.mat4_compose_trs(jnp.array([[0.0, 0, 0], [-500.0, 0, 0],
                                         [0.0, 0, 0]]),
                              mx.qidentity((3,)), jnp.ones(3))
    eye = jnp.array([0.0, 0.0, 5.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    sv = make_subview(view, proj)
    geom = assemble_scene_geometry(rt, mx0, jnp.array([True, True, True]),
                                   sv.planes, eye)
    fv = np.asarray(geom.face_valid)
    fe = np.asarray(rt.face_entity)
    assert fv[fe == 0].any()        # entity 0 visible
    assert not fv[fe == 1].any()    # entity 1 culled
    # world verts moved: entity 1's verts translated by -500
    wv = np.asarray(geom.verts)
    ve = np.asarray(rt.vert_entity)
    assert wv[ve == 1][:, 0].max() < -490


def test_lod_selection():
    v, n, uv, f = cube(1.0)
    # fake 2 LODs: full cube + a single tri
    m = ModelData(verts=v, normals=n,
                  base_color=np.full((24, 3), 0.5, np.float32),
                  rough_metal=np.full((24, 2), 0.5, np.float32),
                  emission=np.zeros((24, 3), np.float32),
                  lod_faces=[f, f[:1]])
    rt = build_render_tables([m, m], np.array([0, 1], np.int32),
                             np.array([True, True]))
    # entity 0 near, entity 1 beyond the first LOD distance
    far = LOD_DISTANCES[0] + 10
    mats = mx.mat4_compose_trs(jnp.array([[0.0, 0, 0], [0.0, 0, -far]]),
                               mx.qidentity((2,)), jnp.ones(2))
    eye = jnp.array([0.0, 0.0, 5.0])
    view = mx.mat4_look_at(eye, jnp.array([0.0, 0.0, -50.0]),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)
    sv = make_subview(view, proj)
    geom = assemble_scene_geometry(rt, mats, jnp.array([True, True]),
                                   sv.planes, eye)
    fv = np.asarray(geom.face_valid)
    fe = np.asarray(rt.face_entity)
    fl = np.asarray(rt.face_lod)
    assert fv[(fe == 0) & (fl == 0)].all()       # near → LOD 0
    assert not fv[(fe == 0) & (fl == 1)].any()
    assert fv[(fe == 1) & (fl == 1)].all()       # far → LOD 1
    assert not fv[(fe == 1) & (fl == 0)].any()


def test_shadow_stream_offscreen_and_coarse_lod():
    """shadow_face_valid: visibility-only (off-frustum casters still
    cast) at the COARSEST LOD per entity; invisible entities cast
    nothing."""
    v, n, uv, f = cube(1.0)
    m = ModelData(verts=v, normals=n,
                  base_color=np.full((24, 3), 0.5, np.float32),
                  rough_metal=np.full((24, 2), 0.5, np.float32),
                  emission=np.zeros((24, 3), np.float32),
                  lod_faces=[f, f[:1]])
    rt = build_render_tables([m, m, m], np.array([0, 1, 2], np.int32),
                             np.array([True, True, True]))
    # entity 0 in view, entity 1 far left out of the frustum (visible),
    # entity 2 marked invisible
    mats = mx.mat4_compose_trs(jnp.array([[0.0, 0, 0], [-500.0, 0, 0],
                                          [0.0, 0, 0]]),
                               mx.qidentity((3,)), jnp.ones(3))
    eye = jnp.array([0.0, 0.0, 5.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    sv = make_subview(view, proj)
    vis = jnp.array([True, True, False])
    geom = assemble_scene_geometry(rt, mats, vis, sv.planes, eye)
    fv = np.asarray(geom.face_valid)
    sfv = np.asarray(geom.shadow_face_valid)
    fe = np.asarray(rt.face_entity)
    sfe = np.asarray(rt.shadow_face_entity)
    # static shadow subset: coarsest LOD only (LOD 1 = 1 face per cube)
    assert np.asarray(rt.shadow_faces).shape == (3, 3)
    assert sfv.shape == sfe.shape
    assert not fv[fe == 1].any()                 # frustum-culled in view
    assert sfv[sfe == 1].any()                   # ...but still casts
    assert not sfv[sfe == 2].any()               # invisible: no shadow
    assert sfv[sfe == 0].all()


def test_shadow_stream_batched_matches_single():
    """Batched assembly emits the same shadow stream per env."""
    from clap_tpu.render.scenerender import assemble_scene_geometry_batch

    rt = make_tables()
    mx1 = mx.mat4_compose_trs(jnp.array([[0.0, 0, 0], [-500.0, 0, 0],
                                         [0.0, 0, 0]]),
                              mx.qidentity((3,)), jnp.ones(3))
    eye = jnp.array([0.0, 0.0, 5.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    sv = make_subview(view, proj)
    vis = jnp.array([True, True, False])
    single = assemble_scene_geometry(rt, mx1, vis, sv.planes, eye)
    B = 2
    bmx = jnp.broadcast_to(mx1, (B, *mx1.shape))
    bvis = jnp.broadcast_to(vis, (B, 3))
    bplanes = jnp.broadcast_to(sv.planes, (B, *sv.planes.shape))
    beyes = jnp.broadcast_to(eye, (B, 3))
    gb, _ = assemble_scene_geometry_batch(rt, bmx, bvis, bplanes, beyes)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(gb.shadow_face_valid[b]),
                                      np.asarray(single.shadow_face_valid))
        np.testing.assert_array_equal(np.asarray(gb.face_valid[b]),
                                      np.asarray(single.face_valid))


def test_chunked_terrain_culls_and_lods():
    """terrain_chunks splits terrain into chunk entities: a side view
    culls behind-camera chunks and distance LOD drops far-chunk detail
    (the monolithic terrain drew ALL faces at LOD0, skip_culling)."""
    import numpy as np
    import jax.numpy as jnp

    from clap_tpu import mathx as mx
    from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                             build_render_tables,
                                             default_edge_ids)
    from clap_tpu.render.view import make_subview
    from clap_tpu.scene.testbed import build_testbed, testbed_models

    tb = build_testbed(seed=7, side=32.0, nr_v=64, n_dynamic=4,
                      max_entities=96, terrain_chunks=4)
    assert tb.chunks and len(tb.chunks) == 16
    models = testbed_models(tb)
    assert len(models) == 4 + 16
    assert models[0].verts.shape[0] == 0          # entity 0 renders nothing
    ent = tb.cfg.entities
    rt = build_render_tables(
        models, np.asarray(ent.model_id), np.asarray(ent.active),
        entity_edge_id=default_edge_ids(np.asarray(ent.active),
                                        np.asarray(ent.body_is_char)))
    # chunk tris cover the whole terrain exactly once at LOD0
    lod0 = (np.asarray(rt.face_lod) == 0)
    n_terrain_lod0 = sum(
        (np.asarray(rt.face_entity)[lod0] >= 1 + 1 + 4).sum()
        for _ in [0])
    assert n_terrain_lod0 >= tb.terrain.idx.size // 3 * 0.95

    eye = jnp.array([0.0, 10.0, 0.0])
    view = mx.mat4_look_at(eye, jnp.array([15.0, 0.0, 0.0]),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    sv = make_subview(view, proj)
    g = assemble_scene_geometry(rt, tb.state0.mx, tb.state0.visible,
                                sv.planes, eye,
                                skip_culling=ent.skip_culling)
    fv = np.asarray(g.face_valid)
    # side view: behind-camera chunks culled + far chunks LOD'd
    assert fv.sum() < 0.5 * lod0.sum(), (fv.sum(), lod0.sum())


def test_single_lod_model_visible_at_distance():
    """A with_lods=False model has only LOD 0; distance-LOD selection
    must clamp to the entity's own chain or the model renders NOTHING
    beyond LOD_DISTANCES[0] (model.c clamps to the model's LOD count).
    Regression: monolithic terrain vanished past 30 units."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                             assemble_scene_geometry_batch,
                                             build_render_tables,
                                             model_from_mesh)
    from clap_tpu.render.view import make_subview
    from clap_tpu import mathx as mx
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(2.0)
    m = model_from_mesh(v, n, f, with_lods=False)
    rt = build_render_tables([m], np.array([0]), np.ones(1, bool))
    assert int(rt.ent_max_lod[0]) == 0

    eye = jnp.array([0.0, 5.0, 100.0])     # 100 units away → raw lod 2
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 300.0)
    planes = make_subview(view, proj).planes
    mx1 = jnp.eye(4)[None]
    g1 = assemble_scene_geometry(rt, mx1[0][None].reshape(1, 4, 4),
                                 jnp.ones(1, bool), planes, eye)
    assert bool(g1.face_valid.any()), "single-env: model culled by LOD"

    gb, _ = assemble_scene_geometry_batch(
        rt, mx1[None], jnp.ones((1, 1), bool), planes[None], eye[None])
    assert bool(gb.face_valid.any()), "batched: model culled by LOD"
