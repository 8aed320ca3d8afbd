"""Full game step: sim + rules + animation + particles in one jit, plus
controller mask edge cases (SURVEY §7.3: the early-return paths the C
handles must be mask-correct here)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu.anim.system import anim_instances_init, default_state_map
from clap_tpu.engine.game import GameSessionState, GameWorld, game_step
from clap_tpu.engine.gamelogic import game_config_empty, game_state_init
from clap_tpu.engine.step import inputs_zero
from clap_tpu.ops.particles import (PARTICLES_MAX, ParticleParams,
                                    particles_init)
from clap_tpu.scene.testbed import build_testbed
from test_anim_system import make_lib
from test_anim import make_rig


def build_gameworld():
    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    E = 16
    gcfg = game_config_empty(1, E)._replace(
        switch_entity=jnp.array([0], jnp.int32),       # terrain is a switch
        switch_valid=jnp.array([True]),
        switch_group=jnp.array([0], jnp.int32),
        switch_permanent=jnp.array([True]),
        platform_group=game_config_empty(1, E).platform_group.at[5].set(0),
        platform_on_pos=game_config_empty(1, E).platform_on_pos.at[5].set(
            jnp.array([3.0, 1.0, 0.0])),
    )
    sk = make_rig()
    lib, names = make_lib()
    acfg = default_state_map(names)
    pparams = ParticleParams(
        active=jnp.array([True]), radius=jnp.array([1.5]),
        min_radius=jnp.array([0.5]), velocity=jnp.array([0.02]),
        dist=jnp.array([1], jnp.int32),
        count=jnp.array([PARTICLES_MAX], jnp.int32))
    gw = GameWorld(scene=tb.cfg, game=gcfg, anim=acfg, anim_sk=sk,
                   anim_lib=lib, particles=pparams,
                   particle_entity=jnp.array([1], jnp.int32))
    parts = particles_init(pparams, tb.state0.pos[jnp.array([1])],
                           jax.random.PRNGKey(1))
    gs = GameSessionState(engine=tb.state0, game=game_state_init(1, 1),
                          anim=anim_instances_init(1), particles=parts,
                          joint_mats=jnp.tile(jnp.eye(4), (1, 3, 1, 1)))
    return gw, gs


def test_game_step_composes():
    gw, gs = build_gameworld()
    step = jax.jit(lambda s, i: game_step(gw, s, i))
    ins = inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))
    for _ in range(30):
        gs = step(gs, ins)
    assert int(gs.engine.frame) == 30
    # character grounded on terrain → permanent switch latched →
    # platform entity 5 visible at its on-position
    assert bool(gs.game.switch_on[0])
    assert bool(gs.engine.visible[5])
    np.testing.assert_allclose(np.asarray(gs.engine.pos[5]), [3, 1, 0],
                               atol=1e-5)
    # animation advanced into the MOVING clip
    assert int(gs.anim.queue.clip[0, 0]) >= 0
    # particles moved but stayed near their system center
    d = np.linalg.norm(np.asarray(gs.particles.pos[0]
                                  - gs.engine.pos[1][None]), axis=-1)
    assert d.max() < 2.5
    assert np.isfinite(np.asarray(gs.joint_mats)).all()


@pytest.mark.slow
def test_controller_zero_dt_edge():
    """dt=0: the C bails via `if (dt_sec < 1e-6) goto rotate` — masks must
    keep the character frozen, not NaN."""
    from clap_tpu.engine.step import engine_step

    gw, gs = build_gameworld()
    st = gs.engine
    step = jax.jit(lambda s, i: engine_step(gw.scene, s, i,
                                            dt=jnp.float32(0.0)))
    out = step(st, inputs_zero(1))
    assert np.isfinite(np.asarray(out.phys.pos)).all()
    # ground_collide's epsilon snap (1e-3) still applies at dt=0, like
    # the C (the dt guard is inside character_apply_velocity, not move)
    np.testing.assert_allclose(np.asarray(out.phys.pos[0]),
                               np.asarray(st.phys.pos[0]), atol=3e-3)


@pytest.mark.slow
def test_controller_huge_dt_clamped():
    """Frame spikes clamp to 1/30 (character.c:252-254)."""
    from clap_tpu.engine.step import engine_step

    gw, gs = build_gameworld()
    step = jax.jit(lambda s, i: engine_step(gw.scene, s, i,
                                            dt=jnp.float32(0.5),
                                            max_substeps=5))
    ins = inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))
    out = step(gs.engine, ins)
    # character moved at most lin_speed * (1/30), not * 0.5
    moved = float(jnp.linalg.norm(out.phys.pos[0] - gs.engine.phys.pos[0]))
    assert moved < 0.4
    assert np.isfinite(np.asarray(out.phys.pos)).all()


@pytest.mark.slow
def test_joint_riding_attachment():
    """Entity attached to a joint of an animated parent follows the
    joint's world transform (model.c:1594-1647)."""
    import jax.numpy as jnp
    from clap_tpu.engine.game import GameWorld, GameSessionState, game_step
    from clap_tpu.engine.step import inputs_zero

    gw, gs = build_gameworld()
    E = 16
    attach_joint = jnp.full((E,), -1, jnp.int32).at[6].set(1)
    attach_offset = jnp.zeros((E, 3)).at[6].set(jnp.array([0.0, 0.1, 0.0]))
    ent = gw.scene.entities._replace(
        parent=gw.scene.entities.parent.at[6].set(1),  # ride the character
        active=gw.scene.entities.active.at[6].set(True))
    gw = gw._replace(scene=gw.scene._replace(entities=ent),
                     attach_joint=attach_joint, attach_offset=attach_offset)
    step = jax.jit(lambda s, i: game_step(gw, s, i))
    ins = inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))
    for _ in range(20):
        gs = step(gs, ins)
    # rider sits near the character's joint-1 position (char origin + up
    # 1 from the rig chain), and moved with the character
    rider = np.asarray(gs.engine.pos[6])
    char = np.asarray(gs.engine.pos[1])
    assert np.isfinite(rider).all()
    d = np.linalg.norm(rider - char)
    assert d < 3.0
    assert abs(rider[0] - char[0]) < 2.0 and rider[0] > 0.1  # followed +x walk


@pytest.mark.slow
def test_roster_switch_retargets_camera():
    """Two-character testbed: cycling control (scene_control_next
    scene.c:23-55) moves the camera orbit target onto the newly
    controlled character on the following frame."""
    from clap_tpu.engine.game import GameWorld, GameSessionState, game_step
    from clap_tpu.engine.gamelogic import game_config_empty, game_state_init
    from clap_tpu.scene.testbed import build_testbed

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16, n_chars=2)
    gw = GameWorld(scene=tb.cfg, game=game_config_empty(1, 16)._replace(
        connect_radius=jnp.float32(5.0)))
    gs = GameSessionState(engine=tb.state0, game=game_state_init(1, 2))
    step = jax.jit(lambda s, i, nxt: game_step(gw, s, i, next_character=nxt))
    ins = inputs_zero(2)

    for _ in range(5):   # settle; chars 3 units apart → char 1 connected
        gs = step(gs, ins, jnp.array(False))
    assert bool(gs.game.connected[1])
    cam0 = np.asarray(gs.engine.camera.pos)
    c0 = np.asarray(gs.engine.phys.pos[0])
    c1 = np.asarray(gs.engine.phys.pos[1])
    # camera currently orbits char 0
    assert np.linalg.norm(cam0 - c0) < np.linalg.norm(cam0 - c1) + 3.0

    gs = step(gs, ins, jnp.array(True))   # Tab: control → char 1
    assert int(gs.game.control) == 1
    gs = step(gs, ins, jnp.array(False))  # next frame: camera follows
    cam1 = np.asarray(gs.engine.camera.pos)
    # orbit target switched: same dist/pitch/yaw → eye shifted by the
    # character separation along x
    shift = cam1 - cam0
    assert abs(shift[0] - (c1[0] - c0[0])) < 0.5


@pytest.mark.slow
def test_switch_entity_through_integrated_step():
    """A character walks onto a NON-terrain switch entity (a raised box
    with its own collision trimesh) through the full game_step: the
    controller's ground ray reports the switch's entity id and the
    platform group appears — then parks again after stepping off
    (non-permanent switch; ref character.c:490-496 + main.c:96-138)."""
    from clap_tpu.physics.heightfield import make_heightfield
    from clap_tpu.physics.narrowphase import make_world

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    # flat terrain for a deterministic walk
    n = 33
    H = np.zeros((n, n), np.float32)
    N = np.zeros((n, n, 3), np.float32)
    N[..., 1] = 1.0
    hf = make_heightfield(H, N, [-16.0, -16.0], 32.0)
    # switch box: top face at y=0.2 over x∈[1.2,3.2], z∈[-1,1], owned by
    # entity 5
    x0, x1, z0, z1, top = 1.2, 3.2, -1.0, 1.0, 0.2
    p00 = [x0, top, z0]
    p01 = [x0, top, z1]
    p10 = [x1, top, z0]
    p11 = [x1, top, z1]
    tris = np.array([[p00, p01, p10], [p10, p01, p11]], np.float32)
    world = make_world(hf, jnp.asarray(tris),
                       tri_entity=jnp.array([5, 5], jnp.int32),
                       hf_entity=0)
    cfg = tb.cfg._replace(world=world)

    E = 16
    g0 = game_config_empty(1, E)
    gcfg = g0._replace(
        switch_entity=jnp.array([5], jnp.int32),
        switch_valid=jnp.array([True]),
        switch_group=jnp.array([0], jnp.int32),
        switch_permanent=jnp.array([False]),
        platform_group=g0.platform_group.at[6].set(0),
        platform_on_pos=g0.platform_on_pos.at[6].set(
            jnp.array([5.0, 2.0, 0.0])),
    )
    gw = GameWorld(scene=cfg, game=gcfg)
    st0 = tb.state0
    # spawn on the flat ground at x=0
    st0 = st0._replace(phys=st0.phys._replace(
        pos=st0.phys.pos.at[0].set(jnp.array([0.0, 1.0, 0.0]))))
    gs = GameSessionState(engine=st0, game=game_state_init(1, 1))

    step = jax.jit(lambda s, i: game_step(gw, s, i))
    ins = inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))

    on_box_seen = False
    plat_while_on = False
    for _ in range(140):
        gs = step(gs, ins)
        ge = int(gs.engine.chars.collision[0])
        if ge == 5:
            on_box_seen = True
            plat_while_on = plat_while_on or bool(gs.engine.visible[6])
    assert on_box_seen, "ground ray never reported the switch entity"
    assert plat_while_on, "platform group did not appear while standing on the switch"
    # walked past the box → non-permanent switch releases, platforms park
    x_now = float(gs.engine.phys.pos[0, 0])
    assert x_now > 4.0, x_now
    assert int(gs.engine.chars.collision[0]) == 0   # back on terrain
    assert not bool(gs.game.switch_on[0])
    assert not bool(gs.engine.visible[6])
