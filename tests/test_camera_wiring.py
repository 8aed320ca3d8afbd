"""Occlusion-shrink camera in the INTEGRATED engine loop + armature
semantic-joint mapping (VERDICT r3 missing #1/#2; reference
camera.c:93-246, scene.c:1474-1492, model.h:30-38)."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu.engine.core import ClapConfig, Engine
from clap_tpu.engine.step import engine_step, inputs_zero
from clap_tpu.physics.heightfield import make_heightfield
from clap_tpu.physics.narrowphase import make_world
from clap_tpu.render.pipeline import RenderOptions
from clap_tpu.scene.loader import load_scene
from clap_tpu.scene.testbed import build_testbed

from test_gltf import make_skinned_gltf


def _walled_testbed():
    """Flat ground with a tall ridge BEHIND the character (+z, where the
    default yaw=0 orbit puts the eye): the camera boom must shrink."""
    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    n = 33
    h = np.zeros((n, n), np.float32)
    # grid x index maps to world x, z likewise; wall across z in [4, 8]
    zw = np.linspace(-16, 16, n)
    h[:, (zw > 3.0) & (zw < 9.0)] = 25.0
    nrm = np.zeros((n, n, 3), np.float32)
    nrm[..., 1] = 1.0
    hf = make_heightfield(h, nrm, [-16.0, -16.0], 32.0)
    world = make_world(hf)
    cfg = tb.cfg._replace(world=world)
    st = tb.state0
    # char at origin on the flat part
    st = st._replace(phys=st.phys._replace(
        pos=st.phys.pos.at[0].set(jnp.array([0.0, 1.0, 0.0]))))
    return cfg, st


@pytest.mark.slow
def test_occlusion_shrinks_engine_step_camera():
    cfg, st0 = _walled_testbed()
    ins = inputs_zero(1)

    step_occl = jax.jit(lambda s, i: engine_step(cfg, s, i,
                                                 camera_occlusion=True))
    step_free = jax.jit(lambda s, i: engine_step(cfg, s, i))
    s_occl = step_occl(st0, ins)
    s_free = step_free(st0, ins)

    target = np.asarray(s_occl.phys.pos[0])
    d_occl = np.linalg.norm(np.asarray(s_occl.camera.pos) - target)
    d_free = np.linalg.norm(np.asarray(s_free.camera.pos) - target)
    want = float(s_occl.camera.dist)
    # free camera sits at the full desired distance, inside the ridge;
    # the occlusion camera pulled in front of it
    assert abs(d_free - want) < 0.3, (d_free, want)
    assert d_occl < d_free - 1.0, (d_occl, d_free)
    # desired distance itself is NOT consumed by the shrink (input state)
    assert abs(float(s_occl.camera.dist) - want) < 1e-6


@pytest.mark.slow
def test_engine_frame_runs_occlusion_camera():
    """Through Engine.frame with graphics attached (not flythrough):
    attach_graphics re-jits the step with the occlusion raycast ON."""
    from test_content import _tables_for_testbed, _sun

    cfg, st0 = _walled_testbed()
    ccfg = ClapConfig(title="t", width=64, height=48, settings=False)

    eng = Engine(ccfg, cfg, st0)
    eng.frame()                                   # headless: no shrink
    target = np.asarray(eng.state.phys.pos[0])
    d_headless = np.linalg.norm(np.asarray(eng.state.camera.pos) - target)

    eng2 = Engine(ccfg, cfg, st0)
    eng2.attach_graphics(
        _tables_for_testbed(cfg), _sun(),
        RenderOptions(width=64, height=48, shadow_size=64, film_grain=0.0))
    eng2.frame()
    d_vis = np.linalg.norm(np.asarray(eng2.state.camera.pos) - target)
    assert np.isfinite(np.asarray(eng2.last_frame)).all()
    assert d_vis < d_headless - 1.0, (d_vis, d_headless)


ARMATURE_SCENE = {
    "name": "arm_scene",
    "model": [
        {
            "name": "hero",
            "gltf": "hero.gltf",
            "physics": {"geom": "capsule", "mass": 70.0},
            "armature": {"head": "elbow", "foot_left": "root",
                         "hand_left": "nosuchjoint"},
            "character": [{"name": "hero1", "position": [0, 0, 0]}],
        },
    ],
}


def test_loader_armature_mapping():
    """scene.json "armature" {semantic: glTF joint name} resolves to rig
    joint indices (scene.c:1474-1492; unknown names → -1)."""
    scene = load_scene(json.dumps(ARMATURE_SCENE),
                       asset_loader=lambda n: make_skinned_gltf().encode(),
                       max_entities=4, max_bodies=2)
    jt = scene.models[0].joint_types
    sk, lib, names, remap = scene.models[0].rig
    # the 2-joint arm: root is joint remap[0], elbow remap[1]
    assert jt["head"] == int(remap[1])
    assert jt["foot_left"] == int(remap[0])
    assert jt["hand_left"] == -1
    arm = scene.char_armature()
    assert arm["head_joint"].shape[0] >= 1
    assert int(arm["head_joint"][0]) == int(remap[1])
    assert int(arm["char_entity"][0]) == 0
    assert float(arm["char_height"][0]) > 0


@pytest.mark.slow
def test_head_joint_camera_target():
    """game_step feeds the rig's JOINT_HEAD world position to the camera
    (camera_target camera.c:174-206): the orbit center moves with an
    animated/offset head."""
    from test_game_step import build_gameworld
    from clap_tpu.engine.game import game_step

    gw, gs = build_gameworld()
    n_chars = gw.scene.char_params.body.shape[0]
    E = gw.scene.entities.active.shape[0]
    char_ent = jnp.asarray(
        [1 + c for c in range(n_chars)], jnp.int32)      # testbed layout
    gw_head = gw._replace(
        head_joint=jnp.full((n_chars,), 2, jnp.int32),   # demo rig joint 2
        char_entity=char_ent,
        char_height=jnp.full((n_chars,), 2.0, jnp.float32))

    ins = inputs_zero(n_chars)
    step_plain = jax.jit(lambda s, i: game_step(gw, s, i))
    step_head = jax.jit(lambda s, i: game_step(gw_head, s, i))
    # two frames: frame 1 populates joint_mats, frame 2 uses them
    sp = step_plain(step_plain(gs, ins), ins)
    sh = step_head(step_head(gs, ins), ins)
    assert np.isfinite(np.asarray(sh.engine.camera.pos)).all()
    # the head joint sits ~1.6 up the rig + 0.2·height above ≠ the body
    # center default: eyes differ
    assert not np.allclose(np.asarray(sp.engine.camera.pos),
                           np.asarray(sh.engine.camera.pos), atol=1e-4)


def test_loader_animation_renames():
    """"animations" {engine name: glTF clip name} renames clips at load
    (scene.c:1662-1684) so default_state_map finds idle/motion/etc."""
    from clap_tpu.anim.system import default_state_map

    sc = dict(ARMATURE_SCENE)
    sc["model"] = [dict(sc["model"][0])]
    sc["model"][0]["animations"] = {"motion": "wave"}
    scene = load_scene(json.dumps(sc),
                       asset_loader=lambda n: make_skinned_gltf().encode(),
                       max_entities=4, max_bodies=2)
    _sk, _lib, names, _remap = scene.models[0].rig
    assert "motion" in names and "wave" not in names
    acfg = default_state_map(names)
    assert int(acfg.state_clip[3]) == names.index("motion")  # CS_MOVING
