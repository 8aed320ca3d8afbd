"""The authored ldjam57-style data level (demo/level57.json): gameplay
blocks load from scene.json, raised-box switches latch through the
integrated step, and platform collision follows visibility (solid when
the group is on, phantom when off) — the reference's switch/platform
mechanic as pure data (main.c:96-138, scene.c:1318-1724)."""
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "demo"))

import assets57
from clap_tpu.engine.game import GameSessionState, GameWorld, game_step
from clap_tpu.engine.gamelogic import game_state_init
from clap_tpu.engine.step import engine_step, inputs_zero
from clap_tpu.scene.loader import load_scene

LEVEL = (Path(__file__).resolve().parents[1] / "demo" / "level57.json")


def _load():
    return load_scene(LEVEL.read_text(), asset_loader=assets57.asset_loader,
                      max_entities=16, max_bodies=4)


def test_level_loads_gameplay_blocks():
    scene = _load()
    g = scene.game
    assert g is not None
    assert g.switch_valid.shape == (2,) and bool(g.switch_valid.all())
    assert bool(g.switch_permanent.all())
    # switch entities are the two crates (slots 0, 1 in load order)
    np.testing.assert_array_equal(np.asarray(g.switch_entity), [0, 1])
    # five platforms across two groups, parked invisible at load
    pg = np.asarray(g.platform_group)
    assert (pg >= 0).sum() == 5
    assert set(pg[pg >= 0]) == {0, 1}
    assert not np.asarray(scene.state0.visible)[pg >= 0].any()
    # two cameras, slot 1 pinned to character 1
    assert scene.state0.cameras.pitch.shape == (2,)
    assert int(scene.cfg.camera_char[1]) == 1
    # characters exist with capsules
    assert scene.cfg.char_params.body.shape == (2,)


@pytest.mark.slow
def test_switch_latches_and_platforms_solidify():
    scene = _load()
    gw = GameWorld(scene=scene.cfg, game=scene.game)
    gs = GameSessionState(engine=scene.state0, game=game_state_init(2, 2))
    step = jax.jit(lambda s, i: game_step(gw, s, i))
    walk = inputs_zero(2)._replace(
        motion=jnp.zeros((2, 2), jnp.float32).at[0, 0].set(1.0))

    latched_at = None
    for f in range(240):
        gs = step(gs, walk)
        if latched_at is None and bool(gs.game.switch_on[0]):
            latched_at = f
            # ground entity at latch is the raised switch BOX, not
            # terrain (terrain ground id is -1 in loaded scenes)
            assert int(gs.engine.chars.collision[0]) == 0
    assert latched_at is not None, "switch A never latched"
    # platforms of group 0 became visible at their on-positions
    vis = np.asarray(gs.engine.visible)
    pg = np.asarray(scene.game.platform_group)
    assert vis[(pg == 0)].all()
    assert not vis[(pg == 1)].any()

    # keep walking: the character climbs onto the now-solid platforms
    on_platform = False
    for _ in range(420):
        gs = step(gs, walk)
        ge = int(gs.engine.chars.collision[0])
        if ge >= 0 and pg[ge] == 0:
            on_platform = True
    assert on_platform, "character never stood on a revealed platform"


@pytest.mark.slow
def test_hidden_platforms_are_phantom():
    """Before any switch: a character dropped over a parked platform
    falls straight through to the terrain (visibility → collision
    coupling); after forcing the group on, the same drop lands on it."""
    scene = _load()
    cfg = scene.cfg
    st = scene.state0
    # teleport char 0 above plat.1 (entity 3 at [9, 0.2, 0], top 0.6)
    b0 = cfg.char_params.body[0]
    st = st._replace(phys=st.phys._replace(
        pos=st.phys.pos.at[b0].set(jnp.array([9.0, 3.0, 0.0]))))
    step = jax.jit(lambda s, i: engine_step(cfg, s, i))
    ins = inputs_zero(2)
    s = st
    for _ in range(120):
        s = step(s, ins)
    foot_hidden = float(s.phys.pos[b0, 1]) - float(cfg.bodies.yoffset[b0])
    assert foot_hidden < 0.05, "fell onto a hidden (phantom) platform?"

    # force group 0 visible → solid
    pg = np.asarray(scene.game.platform_group)
    vis0 = st.visible
    for ei in np.nonzero(pg == 0)[0]:
        vis0 = vis0.at[int(ei)].set(True)
    s = st._replace(visible=vis0)
    for _ in range(120):
        s = step(s, ins)
    foot_solid = float(s.phys.pos[b0, 1]) - float(cfg.bodies.yoffset[b0])
    assert foot_solid > 0.45, (foot_solid, "should stand on plat.1 top 0.6")


@pytest.mark.slow
def test_collision_follows_moved_platform():
    """A platform whose on_pos differs from its load pose: the collision
    triangles TRANSLATE with the entity (SceneConfig.ent_rest_pos path —
    ODE geoms ride their entities, physics.c:789-811), so a character
    lands on the platform at its ACTIVE position, not where the mesh was
    baked at scene load."""
    import json

    doc = json.loads(LEVEL.read_text())
    # plat.1: load pose [9, 0.2, 0] (top 0.6) → active position raised
    # a full unit (top 1.6)
    doc["model"][1]["entity"][1]["platform"]["on_pos"] = [9.0, 1.2, 0.0]
    scene = load_scene(json.dumps(doc), asset_loader=assets57.asset_loader,
                       max_entities=16, max_bodies=4)
    cfg = scene.cfg
    assert cfg.ent_rest_pos is not None, \
        "loader should detect the movable tri entity"
    st = scene.state0
    b0 = cfg.char_params.body[0]
    st = st._replace(phys=st.phys._replace(
        pos=st.phys.pos.at[b0].set(jnp.array([9.0, 4.0, 0.0]))))
    # entity 3 = plat.1, moved to its raised active position + visible
    st = st._replace(pos=st.pos.at[3].set(jnp.array([9.0, 1.2, 0.0])),
                     visible=st.visible.at[3].set(True))
    step = jax.jit(lambda s, i: engine_step(cfg, s, i))
    ins = inputs_zero(2)
    s = st
    for _ in range(150):
        s = step(s, ins)
    foot = float(s.phys.pos[b0, 1]) - float(cfg.bodies.yoffset[b0])
    assert foot > 1.45, (foot, "should stand on the MOVED platform, top 1.6")
    # and the character reports standing on THAT entity
    assert int(s.chars.collision[0]) == 3
