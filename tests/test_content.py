"""Content wiring end-to-end: glTF materials → texture sets → render
tables → frames through Engine.frame (the reference's gltf materials →
model3dtx texture slots → draw path, gltf.c:916-985 + model.h:213-223 +
scene.c:1381-1421) — no hand-built SceneGeometry anywhere."""
import base64
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap_tpu.engine.core import ClapConfig, Engine
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import RenderOptions
from clap_tpu.scene.content import scene_render_setup
from clap_tpu.scene.loader import load_scene
from clap_tpu.utils.png import encode_png
from test_gltf import make_skinned_gltf, _b64


def _sun(n=1):
    lights = lights_empty(n)
    d = jnp.array([-0.4, -0.8, -0.4])
    return lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))


def make_textured_gltf():
    """Unit cube (24 verts) with UVs, a checkerboard diffuse PNG and a
    bumpy tangent-space normal PNG embedded as data-URI images."""
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.0)
    v = np.asarray(v, np.float32)
    n = np.asarray(n, np.float32)
    uv = np.asarray(uv, np.float32)
    idx = np.asarray(f, np.uint32).reshape(-1)

    checker = np.zeros((8, 8, 3), np.uint8)
    checker[::2, ::2] = (255, 40, 40)
    checker[1::2, 1::2] = (255, 40, 40)
    checker[checker.sum(-1) == 0] = (40, 40, 255)
    nrm_img = np.full((8, 8, 3), (128, 128, 255), np.uint8)
    nrm_img[2:6, 2:6] = (200, 128, 180)     # a bump patch

    def png_uri(img):
        return ("data:image/png;base64,"
                + base64.b64encode(encode_png(img)).decode())

    buffers = [v, n, uv, idx]
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": _b64(a), "byteLength": a.nbytes}
                    for a in buffers],
        "bufferViews": [
            {"buffer": i, "byteOffset": 0, "byteLength": a.nbytes}
            for i, a in enumerate(buffers)],
        "accessors": [
            {"bufferView": 0, "componentType": 5126,
             "count": len(v), "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126,
             "count": len(n), "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126,
             "count": len(uv), "type": "VEC2"},
            {"bufferView": 3, "componentType": 5125,
             "count": len(idx), "type": "SCALAR"},
        ],
        "meshes": [{"name": "box", "primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"name": "crate", "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.8,
            "baseColorTexture": {"index": 0}},
            "normalTexture": {"index": 1}}],
        "textures": [{"source": 0}, {"source": 1}],
        "images": [{"uri": png_uri(checker)}, {"uri": png_uri(nrm_img)}],
        "nodes": [{"name": "box", "mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    return json.dumps(doc)


SCENE = json.dumps({
    "name": "content-test",
    "model": [
        {"name": "crate", "gltf": "crate.gltf",
         "entity": [{"name": "crate.0", "position": [2.0, 0.5, 0.0]}]},
        {"name": "hero", "gltf": "hero.gltf",
         "character": [{"name": "hero.0", "position": [0, 0.5, 0]}]},
    ],
    "light": [{"direction": [-0.4, -0.8, -0.4], "color": [1, 0.95, 0.9]}],
})


def _loader(name):
    if name == "crate.gltf":
        return make_textured_gltf().encode()
    return make_skinned_gltf().encode()


def _setup():
    scene = load_scene(SCENE, asset_loader=_loader, max_entities=8,
                       max_bodies=4)
    rt, ts = scene_render_setup(scene, tex_size=16, with_lods=False)
    return scene, rt, ts


def test_gltf_materials_reach_tables():
    scene, rt, ts = _setup()
    # texture set built from the glTF PNGs
    assert ts is not None
    assert ts.diffuse.shape == (1, 16, 16, 3)
    assert ts.normal is not None and ts.normal.shape == (1, 16, 16, 3)
    # checker colors survived decode+resize (red and blue cells)
    d = np.asarray(ts.diffuse[0])
    assert d[..., 0].max() > 0.9 and d[..., 2].max() > 0.9
    # tex_id stream: crate verts → layer 0, hero verts → untextured
    tex_id = np.asarray(rt.tex_id)
    vent = np.asarray(rt.vert_entity)
    assert (tex_id[vent == 0] == 0.0).all()      # crate entity slot 0
    assert (tex_id[vent == 1] == -1.0).all()     # hero
    # uv + unit tangents flow for the textured model
    uvs = np.asarray(rt.uv)[vent == 0]
    assert uvs.max() > 0.9 and np.isfinite(uvs).all()
    tg = np.asarray(rt.tangent)[vent == 0]
    np.testing.assert_allclose(np.linalg.norm(tg[:, :3], axis=-1), 1.0,
                               atol=1e-4)
    # per-entity edge ids: the character entity gets solid id 1
    eid = np.asarray(rt.edge_id)
    assert (eid[vent == 1] == 1.0).all()
    assert (eid[vent == 0] == 0.0).all()


def _engine_with_graphics(scene, rt, ts, **attach_kw):
    cfg = ClapConfig(title="t", width=96, height=64, settings=False)
    eng = Engine(cfg, scene.cfg, scene.state0)
    opts = attach_kw.pop("opts", None) or RenderOptions(
        width=96, height=64, shadow_size=64, film_grain=0.0)
    eng.attach_graphics(rt, scene.lights, opts, textures=ts, **attach_kw)
    return eng


@pytest.mark.slow
def test_engine_frame_textured():
    scene, rt, ts = _setup()
    eng = _engine_with_graphics(scene, rt, ts)
    eng.frame()
    f_tex = np.asarray(eng.last_frame)
    assert f_tex.shape == (64, 96, 3)
    assert np.isfinite(f_tex).all()
    assert 0.0 <= f_tex.min() and f_tex.max() <= 1.0
    # same frame untextured differs — the texture path is live
    eng2 = _engine_with_graphics(scene, rt, None)
    eng2.frame()
    f_plain = np.asarray(eng2.last_frame)
    assert not np.allclose(f_tex, f_plain, atol=1e-3)


@pytest.mark.slow
def test_engine_frame_outlines():
    scene, rt, ts = _setup()
    base = dict(width=96, height=64, shadow_size=64, film_grain=0.0)
    eng = _engine_with_graphics(scene, rt, ts, opts=RenderOptions(
        outline_strength=0.0, **base))
    eng.frame()
    f0 = np.asarray(eng.last_frame)
    eng2 = _engine_with_graphics(scene, rt, ts, opts=RenderOptions(
        outline_strength=0.9, **base))
    eng2.frame()
    f1 = np.asarray(eng2.last_frame)
    # outlines darken edge pixels through the integrated path
    assert (f1 <= f0 + 1e-6).all()
    assert (f0 - f1).max() > 0.05


@pytest.mark.slow
def test_engine_frame_particles():
    """Particles carried by the game session render inside Engine.frame
    (particle.c:122-125) — no manual particles= plumbing in the demo."""
    from test_game_step import build_gameworld
    from clap_tpu.engine.game import game_step

    gw, gs = build_gameworld()
    cfg = ClapConfig(title="t", width=96, height=64, settings=False)
    eng = Engine(cfg, gw.scene, gs.engine, game_world=gw, session0=gs)
    opts = RenderOptions(width=96, height=64, shadow_size=64,
                         film_grain=0.0)
    eng.attach_graphics(
        jax.tree.map(lambda x: x, _tables_for_testbed(gw.scene)),
        _sun(), opts, particle_world=gw.particles, particle_size=0.5,
        particle_color=(1.0, 0.1, 0.1))
    eng.frame()
    f_part = np.asarray(eng.last_frame)
    assert np.isfinite(f_part).all()

    eng2 = Engine(cfg, gw.scene, gs.engine, game_world=gw, session0=gs)
    eng2.attach_graphics(_tables_for_testbed(gw.scene), _sun(), opts)
    eng2.frame()
    f_none = np.asarray(eng2.last_frame)
    # red particles cluster around the character — frames differ
    assert not np.allclose(f_part, f_none, atol=1e-3)


@pytest.mark.slow
def test_lut_autoswitch():
    """scene_lut_autoswitch parity (scene.c:93-129): a re-arming frame
    timer cycles the grading LUT; the jitted render consumes the volume
    as a traced argument, so switching presets never re-traces."""
    scene, rt, ts = _setup()
    lut_a = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, 8)[:, None, None, None], (8, 8, 8, 3))
    lut_b = 1.0 - lut_a                      # inverted grade
    eng = _engine_with_graphics(scene, rt, ts, opts=RenderOptions(
        width=96, height=64, shadow_size=64, film_grain=0.0,
        lighting_lut=True))
    eng.lut_autoswitch_set(1e-9, volumes=[lut_a, lut_b])
    eng.frame()                              # timer fires → lut_b
    f1 = np.asarray(eng.last_frame)
    assert eng._lut_idx == 1
    eng.frame()                              # cycles back → lut_a
    f2 = np.asarray(eng.last_frame)
    assert eng._lut_idx == 0
    assert not np.allclose(f1, f2, atol=1e-3)   # grade visibly changed
    # cancel: pending tick no-ops, volume stays put
    eng.lut_autoswitch_set(0)
    eng.frame()
    assert eng._lut_idx == 0


def _tables_for_testbed(scene_cfg):
    """Minimal render tables for the testbed scene config (procedural
    models, like demo/testbed.py)."""
    from clap_tpu.render.scenerender import (build_render_tables,
                                             default_edge_ids,
                                             model_from_mesh)
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.0)
    flat_v = np.array([[-16, 0, -16], [16, 0, -16], [16, 0, 16],
                       [-16, 0, 16]], np.float32)
    flat_n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    flat_f = np.array([[0, 2, 1], [0, 3, 2]], np.uint32)
    models = [
        model_from_mesh(flat_v, flat_n, flat_f, with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.8, 0.5, 0.4),
                        with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.6, 0.6, 0.7),
                        with_lods=False),
        model_from_mesh(v, n, f, base_color=(0.4, 0.3, 0.2),
                        with_lods=False),
    ]
    ent = scene_cfg.entities
    edge = default_edge_ids(np.asarray(ent.active),
                            np.asarray(ent.body_is_char))
    return build_render_tables(models, np.asarray(ent.model_id),
                               np.asarray(ent.active), entity_edge_id=edge)
