"""Per-env dynamic batched rendering (assemble_scene_geometry_batch +
render_frame_dynamic_batch) — the north-star composition's geometry
path. Checks exact parity of the one-hot-matmul selection against the
single-env gather path, image-level parity of the local-attrs shading
mode, and the full composed step+render program."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import (RenderOptions, render_frame,
                                      render_frame_dynamic_batch)
from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                         assemble_scene_geometry_batch,
                                         build_render_tables,
                                         default_edge_ids, model_from_mesh)
from clap_tpu.render.view import make_subview
from clap_tpu.render.camera import camera_view_proj


def _sun():
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    return lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))


def _tables(E=6):
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.0)
    flat_v = np.array([[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]],
                      np.float32)
    flat_n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    flat_f = np.array([[0, 2, 1], [0, 3, 2]], np.uint32)
    models = [
        model_from_mesh(flat_v, flat_n, flat_f, with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.8, 0.4, 0.3),
                        with_lods=False),
    ]
    model_id = np.array([0, 1, 1, 1, 0, 0], np.int32)[:E]
    active = np.array([1, 1, 1, 0, 0, 0], bool)[:E]
    edge = np.array([0, 1, 2, 0, 0, 0], np.float32)[:E]
    rt = build_render_tables(models, model_id, active, entity_edge_id=edge)
    return rt


def _env_states(B, E=6, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((B, E, 3), np.float32)
    pos[:, 1] = rng.uniform(-2, 2, (B, 3)) * np.array([1, 0, 1]) \
        + np.array([0, 0.5, 0])
    pos[:, 2] = rng.uniform(-3, 3, (B, 3)) * np.array([1, 0, 1]) \
        + np.array([0, 0.5, 0])
    ang = rng.uniform(0, 2 * np.pi, (B, E)).astype(np.float32)
    mxs = np.zeros((B, E, 4, 4), np.float32)
    for b in range(B):
        for e in range(E):
            q = jnp.array([0.0, np.sin(ang[b, e] / 2), 0.0,
                           np.cos(ang[b, e] / 2)], jnp.float32)
            mxs[b, e] = np.asarray(mx.mat4_compose_trs(
                jnp.asarray(pos[b, e]), q, jnp.float32(1.0)))
    visible = np.ones((B, E), bool)
    eyes = np.stack([np.full(B, 6.0), np.full(B, 5.0),
                     np.linspace(5.0, 7.0, B)], -1).astype(np.float32)
    return jnp.asarray(mxs), jnp.asarray(visible), jnp.asarray(eyes)


@pytest.mark.slow
def test_batch_assembly_matches_single_env():
    rt = _tables()
    B = 3
    mxs, vis, eyes = _env_states(B)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)

    geom_b, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    for b in range(B):
        g1 = assemble_scene_geometry(rt, mxs[b], vis[b], planes[b], eyes[b])
        # one-hot selection is EXACT: transformed verts bit-match the
        # gather path's einsum
        np.testing.assert_allclose(np.asarray(geom_b.verts[b]),
                                   np.asarray(g1.verts), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(geom_b.face_valid[b]),
                                      np.asarray(g1.face_valid))


@pytest.mark.slow
def test_dynamic_batch_image_parity():
    rt = _tables()
    B = 2
    mxs, vis, eyes = _env_states(B, seed=3)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    lights = _sun()
    opts = RenderOptions(width=96, height=96, shadow_size=64,
                         film_grain=0.0, ssao=False)

    geom_b, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    imgs = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        opts, g, axes, v, proj, lights, e, far=60.0))(geom_b, views, eyes)
    assert imgs.shape == (B, 96, 96, 3)
    assert np.isfinite(np.asarray(imgs)).all()

    for b in range(B):
        g1 = assemble_scene_geometry(rt, mxs[b], vis[b], planes[b], eyes[b])
        ref = render_frame(opts, g1, views[b], proj, lights, eyes[b],
                           far=60.0)
        diff = np.abs(np.asarray(imgs[b]) - np.asarray(ref))
        # local-attrs mode (interp-then-rotate) vs world-space
        # interpolation: linear ops commute, so only fp/normalization
        # order differs
        assert diff.mean() < 2e-3, diff.mean()
        assert np.quantile(diff, 0.999) < 0.15


@pytest.mark.slow
def test_composed_step_and_render_batch():
    """The north-star program: vmapped engine_step + per-env dynamic
    assembly + render in ONE jit."""
    from clap_tpu.engine.step import engine_step, inputs_zero
    from clap_tpu.scene.testbed import build_testbed, replicate_state
    from test_content import _tables_for_testbed

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=4,
                       max_entities=16)
    rt = _tables_for_testbed(tb.cfg)
    lights = _sun()
    opts = RenderOptions(width=64, height=64, shadow_size=64,
                         film_grain=0.0, ssao=False)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    B = 4
    sts = replicate_state(tb.state0, B)
    ins1 = inputs_zero(1)._replace(
        motion=jnp.array([[1.0, 0.0]], jnp.float32))
    ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (B, *x.shape)), ins1)
    skip = tb.cfg.entities.skip_culling

    @jax.jit
    def step_and_render(sts, ins):
        sts = jax.vmap(lambda s, i: engine_step(tb.cfg, s, i))(sts, ins)
        cam = sts.camera

        def view_of(c):
            q = mx.qmul(
                mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), c.yaw),
                mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]),
                                        c.pitch))
            return camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]

        views = jax.vmap(view_of)(cam)
        planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
        geom, axes = assemble_scene_geometry_batch(
            rt, sts.mx, sts.visible, planes, cam.pos, skip_culling=skip)
        imgs = render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                          lights, cam.pos, far=100.0)
        return sts, imgs

    sts, imgs = step_and_render(sts, ins)
    sts, imgs = step_and_render(sts, ins)
    assert imgs.shape == (B, 64, 64, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    assert int(sts.frame[0]) == 2
    # the scene actually renders content (not all background)
    assert np.asarray(imgs).std() > 0.01


def test_dynamic_batch_attr_bf16_close():
    # bf16 attr-table mode through the FULL dynamic-batch frame: close
    # to the f32 image (bf16 rounds normals/colors, ids stay exact so
    # entity rotation lookup and edge keys don't shift)
    rt = _tables()
    B = 2
    mxs, vis, eyes = _env_states(B, seed=5)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    lights = _sun()
    o32 = RenderOptions(width=96, height=96, shadow_size=64,
                        film_grain=0.0, ssao=False)
    o16 = RenderOptions(width=96, height=96, shadow_size=64,
                        film_grain=0.0, ssao=False, attr_bf16=True)

    geom_b, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    i32 = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        o32, g, axes, v, proj, lights, e, far=60.0))(geom_b, views, eyes)
    i16 = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        o16, g, axes, v, proj, lights, e, far=60.0))(geom_b, views, eyes)
    diff = np.abs(np.asarray(i16) - np.asarray(i32))
    assert diff.mean() < 3e-3, diff.mean()
    assert np.quantile(diff, 0.999) < 0.1

def test_dynamic_batch_kernel_attrs_exact():
    """kernel_attrs mode (raster-kernel normal interpolation + one-hot
    per-entity flats, NO per-pixel attr gather) through the FULL
    dynamic-batch frame: the interpolation math is identical
    (perspective-correct numerators, normalize), so the image must
    match the gather path to float tolerance — including edge-id
    outlines from the per-entity flat table."""
    rt = _tables()
    assert rt.flat_eligible and rt.ent_flat is not None
    # edge ids flowed into the flat table (col 8)
    np.testing.assert_allclose(np.asarray(rt.ent_flat[:, 8]),
                               np.array([0, 1, 2, 0, 0, 0], np.float32))
    B = 2
    mxs, vis, eyes = _env_states(B, seed=5)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    lights = _sun()
    o_g = RenderOptions(width=96, height=96, shadow_size=64,
                        film_grain=0.0)
    o_k = RenderOptions(width=96, height=96, shadow_size=64,
                        film_grain=0.0, kernel_attrs=True)

    geom_b, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    assert geom_b.ent_flat is not None
    i_g = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        o_g, g, axes, v, proj, lights, e, far=60.0))(geom_b, views, eyes)
    i_k = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
        o_k, g, axes, v, proj, lights, e, far=60.0))(geom_b, views, eyes)
    diff = np.abs(np.asarray(i_k) - np.asarray(i_g))
    assert diff.max() < 1e-4, diff.max()


@pytest.mark.slow
def test_kernel_attrs_eligibility_raises():
    """Static eligibility misuse raises instead of silently shading
    wrong: missing ent_flat, and per-vertex-varying materials mark the
    tables ineligible at build time."""
    import pytest

    from clap_tpu.render.scenerender import ModelData

    rt = _tables()
    B = 1
    mxs, vis, eyes = _env_states(B)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    geom_b, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    geom_no = geom_b._replace(ent_flat=None)
    opts = RenderOptions(width=32, height=32, shadow_size=32,
                         kernel_attrs=True)
    with pytest.raises(ValueError):
        render_frame_dynamic_batch(opts, geom_no, axes, views, proj,
                                   _sun(), eyes, far=60.0)

    # per-vertex color variation → flat_eligible False at build time
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.0)
    m = model_from_mesh(v, n, f, with_lods=False)
    bc = np.asarray(m.base_color).copy()
    bc[0] = [1.0, 0.0, 0.0]
    m = m._replace(base_color=bc)
    rt2 = build_render_tables([m], np.array([0]), np.array([True]))
    assert not rt2.flat_eligible


@pytest.mark.slow
def test_static_shadow_split():
    """Static/dynamic shadow-caster split: ground bakes ONCE into a
    bounds-fit atlas, only the cubes stay in the per-env CSM stream;
    factors multiply. The split image must stay close to the full
    per-env CSM image (different estimator footprints — tolerance, not
    exactness), the dynamic stream must actually shrink, and the baked
    atlas must contain real occluder depths."""
    from clap_tpu.render.scenerender import (bake_static_shadow,
                                             build_render_tables)
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.0)
    flat_v = np.array([[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]],
                      np.float32)
    flat_n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    flat_f = np.array([[0, 2, 1], [0, 3, 2]], np.uint32)
    models = [
        model_from_mesh(flat_v, flat_n, flat_f, with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.8, 0.4, 0.3),
                        with_lods=False),
    ]
    model_id = np.array([0, 1, 1], np.int32)
    active = np.ones(3, bool)
    static_mask = np.array([True, False, False])
    rt_full = build_render_tables(models, model_id, active)
    rt_split = build_render_tables(models, model_id, active,
                                   entity_shadow_static=static_mask)
    assert rt_split.static_shadow_faces.shape[0] == 2        # the ground
    assert rt_split.shadow_faces.shape[0] \
        == rt_full.shadow_faces.shape[0] - 2                 # cubes only

    B = 2
    E = 3
    mxs = np.tile(np.eye(4, dtype=np.float32), (B, E, 1, 1))
    mxs[:, 1, :3, 3] = [1.5, 2.0, 0.0]     # cube floating above ground
    mxs[:, 2, :3, 3] = [-2.0, 0.5, 1.0]
    mxs = jnp.asarray(mxs)
    vis = jnp.ones((B, E), bool)
    eyes = jnp.asarray(np.tile([5.0, 6.0, 8.0], (B, 1)), jnp.float32)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v_: make_subview(v_, proj).planes)(views)
    lights = _sun()
    opts = RenderOptions(width=96, height=96, shadow_size=96,
                         film_grain=0.0, ssao=False)

    mx0 = mxs[0]
    sm, mvp, cd = bake_static_shadow(rt_split, mx0, lights.direction[0],
                                     shadow_size=128, far=60.0)
    # the atlas saw the ground: occluder depths < the 1.0 far clear
    assert float(jnp.min(sm[..., 0])) < 0.999

    g_full, axes = assemble_scene_geometry_batch(
        rt_full, mxs, vis, planes, eyes)
    g_split, _ = assemble_scene_geometry_batch(
        rt_split, mxs, vis, planes, eyes)
    img_full = jax.jit(lambda g, v_, e: render_frame_dynamic_batch(
        opts, g, axes, v_, proj, lights, e, far=60.0))(g_full, views, eyes)
    img_split = jax.jit(lambda g, v_, e: render_frame_dynamic_batch(
        opts, g, axes, v_, proj, lights, e, far=60.0,
        static_shadow=(sm, mvp, cd)))(g_split, views, eyes)
    diff = np.abs(np.asarray(img_split) - np.asarray(img_full))
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.99) < 0.25

    # the floating cube still casts: its shadow darkens the ground in
    # the split image vs a no-shadow-stream render of the same scene
    g_nosh = g_split._replace(
        shadow_face_valid=jnp.zeros_like(g_split.shadow_face_valid))
    img_nosh = jax.jit(lambda g, v_, e: render_frame_dynamic_batch(
        opts, g, axes, v_, proj, lights, e, far=60.0,
        static_shadow=(sm, mvp, cd)))(g_nosh, views, eyes)
    assert float(np.abs(np.asarray(img_nosh) - np.asarray(img_split))
                 .max()) > 0.05


@pytest.mark.slow
def test_static_shadow_all_static_scene():
    """Fully static scene under the split: the dynamic caster stream is
    empty, render_frame must skip the CSM fit (a 0-length record stream
    can't bin) and shade entirely from the baked static atlas — the
    floating cube's baked shadow must darken the ground."""
    from clap_tpu.render.scenerender import (bake_static_shadow,
                                             build_render_tables)
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.2)
    flat_v = np.array([[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]],
                      np.float32)
    flat_n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    flat_f = np.array([[0, 2, 1], [0, 3, 2]], np.uint32)
    models = [
        model_from_mesh(flat_v, flat_n, flat_f, with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.8, 0.4, 0.3),
                        with_lods=False),
    ]
    rt = build_render_tables(models, np.array([0, 1]), np.ones(2, bool),
                             entity_shadow_static=np.ones(2, bool))
    assert rt.shadow_faces.shape[0] == 0    # everything static

    B = 1
    mxs = np.tile(np.eye(4, dtype=np.float32), (B, 2, 1, 1))
    mxs[:, 1, :3, 3] = [0.5, 2.0, 0.0]
    mxs = jnp.asarray(mxs)
    vis = jnp.ones((B, 2), bool)
    eyes = jnp.asarray([[5.0, 6.0, 8.0]], jnp.float32)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v_: make_subview(v_, proj).planes)(views)
    lights = _sun()
    opts = RenderOptions(width=96, height=96, shadow_size=96,
                         film_grain=0.0, ssao=False)
    sm, mvp, cd = bake_static_shadow(rt, mxs[0], lights.direction[0],
                                     shadow_size=128, far=60.0)
    geom, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    img = render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                     lights, eyes, far=60.0,
                                     static_shadow=(sm, mvp, cd))
    img_no = render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                        lights, eyes, far=60.0)
    assert np.isfinite(np.asarray(img)).all()
    # the baked shadow darkens the ground vs the no-atlas render
    assert float(np.abs(np.asarray(img) - np.asarray(img_no)).max()) > 0.05


def test_shadow_static_mask_platform_exclusion():
    """Switch-driven platform groups toggle visibility at play time —
    shadow_static_mask must keep them in the DYNAMIC caster stream even
    though they have no physics body."""
    from clap_tpu.engine.state import EntityParams
    from clap_tpu.render.scenerender import shadow_static_mask

    E = 5
    ent = EntityParams(
        active=jnp.array([1, 1, 1, 1, 0], bool),
        model_id=jnp.zeros(E, jnp.int32),
        body=jnp.array([-1, 0, -1, -1, -1], jnp.int32),
        body_is_char=jnp.array([0, 0, 1, 0, 0], bool),
        yoffset=jnp.zeros(E), parent=jnp.full(E, -1, jnp.int32),
        skip_culling=jnp.zeros(E, bool))
    pg = jnp.array([-1, -1, -1, 0, -1], jnp.int32)  # entity 3 = platform
    m = shadow_static_mask(ent)
    np.testing.assert_array_equal(m, [True, False, False, True, False])
    m2 = shadow_static_mask(ent, platform_group=pg)
    np.testing.assert_array_equal(m2, [True, False, False, False, False])


@pytest.mark.slow
def test_record_compact_image_parity():
    """Fixed-capacity valid-first face compaction (record_compact): with
    cap >= valid faces the image is identical to the uncompacted frame
    in BOTH surface paths (the stream order changes, but the raster
    winner is depth-selected, not order-selected)."""
    rt = _tables()
    B = 2
    mxs, vis, eyes = _env_states(B, seed=7)
    # hide one cube so part of the static stream is invalid (the
    # compaction's reason to exist)
    vis = vis.at[:, 2].set(False)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 60.0)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    lights = _sun()
    geom_b, axes = assemble_scene_geometry_batch(rt, mxs, vis, planes, eyes)
    T = int(rt.faces.shape[0])
    vmax = int(np.asarray(geom_b.face_valid).sum(-1).max())
    cap = (vmax + 7) // 8 * 8 + 8        # fits the valid set...
    assert cap < T                       # ...and actually engages
    for kattrs in (False, True):
        base = dict(width=96, height=96, shadow_size=64, film_grain=0.0,
                    kernel_attrs=kattrs)
        i0 = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
            RenderOptions(**base), g, axes, v, proj, lights, e,
            far=60.0))(geom_b, views, eyes)
        i1 = jax.jit(lambda g, v, e: render_frame_dynamic_batch(
            RenderOptions(record_compact=cap, **base), g, axes, v, proj,
            lights, e, far=60.0))(geom_b, views, eyes)
        diff = np.abs(np.asarray(i1) - np.asarray(i0))
        assert diff.max() < 1e-4, (kattrs, diff.max())
