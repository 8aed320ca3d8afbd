"""Motion, camera occlusion, particles, game logic tests."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu import mathx as mx
from clap_tpu.char.motion import camera_yaw_quat, motion_compute_ls, motion_get
from clap_tpu.render.camera import camera_update, camera_target
from clap_tpu.ops.particles import (ParticleParams, particles_init,
                                    particles_update, billboard_matrix,
                                    PARTICLES_MAX)
from clap_tpu.engine.gamelogic import (GameConfig, game_config_empty,
                                       game_state_init, game_update,
                                       PLATFORM_PARK_Y)
from test_physics import flat_world


def test_motion_diagonal_normalized():
    dx, dy = motion_compute_ls(0, 1, 1, 0)  # right + up
    assert abs(float(dx) - np.cos(np.pi / 4)) < 1e-6
    assert abs(float(dy) + np.sin(np.pi / 4)) < 1e-6


def test_motion_camera_relative():
    # camera yawed 90°: pushing "forward" (−z stick) should move along −x
    q = camera_yaw_quat(jnp.float32(np.pi / 2))
    dx, dz = motion_get(jnp.float32(0.0), jnp.float32(-1.0), q, jnp.float32(2.0))
    assert abs(float(dx) + 2.0) < 1e-5
    assert abs(float(dz)) < 1e-5


def test_camera_occlusion_shrinks():
    # wall at x=3 facing the target (normal -x, so target-side rays hit
    # the front face — camera rays are backface-culled like the
    # reference's, physics.c:489)
    wall = np.array([
        [[3, -10, -10], [3, 10, 10], [3, 10, -10]],
        [[3, -10, -10], [3, -10, 10], [3, 10, 10]],
    ], np.float32)
    from clap_tpu.physics.narrowphase import make_world

    world = make_world(flat_world().hf, jnp.asarray(wall))
    target = jnp.array([0.0, 2.0, 0.0])
    # yaw +90° orbits the camera to +x — behind the wall
    eye, q, dist = camera_update(world, target, jnp.float32(0.0),
                                 jnp.float32(np.pi / 2), jnp.float32(8.0))
    assert float(dist) < 8.0 * 0.7  # shrunk to clear the wall at x=3
    # no obstruction in -x direction
    eye2, q2, dist2 = camera_update(world, target, jnp.float32(0.0),
                                    jnp.float32(-np.pi / 2), jnp.float32(8.0))
    assert float(dist2) > 7.0


def test_particles_shell_and_respawn():
    params = ParticleParams(
        active=jnp.array([True]),
        radius=jnp.array([2.0]), min_radius=jnp.array([1.0]),
        velocity=jnp.array([0.05]), dist=jnp.array([0], jnp.int32),
        count=jnp.array([PARTICLES_MAX], jnp.int32),
    )
    centers = jnp.zeros((1, 3))
    st = particles_init(params, centers, jax.random.PRNGKey(0))
    r = np.linalg.norm(np.asarray(st.pos[0]), axis=-1)
    assert (r >= 0.99).all() and (r <= 2.01).all()
    step = jax.jit(lambda s: particles_update(params, s, centers))
    for _ in range(100):
        st = step(st)
    r = np.linalg.norm(np.asarray(st.pos[0]), axis=-1)
    # particles drift but respawn keeps them within ~radius + one step
    assert r.max() < 2.2
    assert np.isfinite(np.asarray(st.pos)).all()


def test_billboard():
    view = mx.mat4_look_at(jnp.array([3.0, 2.0, 5.0]), jnp.zeros(3),
                           jnp.array([0.0, 1.0, 0.0]))
    b = billboard_matrix(view)
    # view_rot · billboard_rot = I
    r = np.asarray(view[:3, :3] @ b[:3, :3])
    np.testing.assert_allclose(r, np.eye(3), atol=1e-5)


def test_switch_platform_logic():
    E, K, C = 8, 2, 2
    gcfg = game_config_empty(K, E)
    # switch at entity 1 controls group 0; platforms 4,5 in group 0
    gcfg = gcfg._replace(
        switch_entity=jnp.array([1, 2], jnp.int32),
        switch_valid=jnp.array([True, False]),
        switch_group=jnp.array([0, 0], jnp.int32),
        switch_permanent=jnp.array([False, False]),
        platform_group=gcfg.platform_group.at[4].set(0).at[5].set(0),
        platform_on_pos=gcfg.platform_on_pos.at[4].set(jnp.array([1.0, 2, 3])),
    )
    gs = game_state_init(K, C)
    chars = jnp.zeros((C, 3))

    # step on the switch (ground entity becomes 1)
    gs, vis, pos = game_update(gcfg, gs, jnp.int32(1), chars,
                               jnp.float32(0.0), jnp.array(False))
    assert bool(gs.switch_on[0])
    assert bool(vis[4]) and bool(vis[5])
    np.testing.assert_allclose(np.asarray(pos[4]), [1, 2, 3], atol=1e-6)

    # step off onto plain ground (entity 0): non-permanent switch off
    gs, vis, pos = game_update(gcfg, gs, jnp.int32(0), chars,
                               jnp.float32(0.0), jnp.array(False))
    assert not bool(gs.switch_on[0])
    assert not bool(vis[4])
    assert abs(float(pos[4, 1]) - (2 + PLATFORM_PARK_Y)) < 1e-5


def test_roster_switching():
    gcfg = game_config_empty(1, 4)._replace(connect_radius=jnp.float32(2.0))
    gs = game_state_init(1, 3)
    chars = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [10.0, 0, 0]])
    gs, _, _ = game_update(gcfg, gs, jnp.int32(-1), chars, jnp.float32(0.0),
                           jnp.array(False))
    assert bool(gs.connected[1]) and not bool(gs.connected[2])
    # cycle: control moves to char 1 (the only other connected)
    gs, _, _ = game_update(gcfg, gs, jnp.int32(-1), chars, jnp.float32(0.0),
                           jnp.array(True))
    assert int(gs.control) == 1


def test_game_over():
    gcfg = game_config_empty(1, 2)
    gs = game_state_init(1, 1)
    gs, _, _ = game_update(gcfg, gs, jnp.int32(-1), jnp.zeros((1, 3)),
                           jnp.float32(-200.0), jnp.array(False))
    assert bool(gs.game_over)


def test_dash_speed_burst():
    """Dash ×1.5 for 1 s, then cooldown (character.c:12-67)."""
    from clap_tpu.char import controller as C
    from test_physics import flat_world, make_char

    world = flat_world()
    params, st, cp, cs = make_char(world, pos=(0.0, 0.0, 0.0))
    move = jax.jit(lambda pos, cs, dash: C.character_move(
        world, params, cp, cs, pos, jnp.float32(1.0), jnp.float32(0.0),
        jnp.array(False), jnp.float32(1 / 60), dash_input=dash))
    pos = st.pos
    # warm up to MOVING
    for _ in range(10):
        p, cs = move(pos, cs, jnp.array(False))
        pos = pos.at[0].set(p)
    x0 = float(pos[0, 0])
    # 30 frames plain
    for _ in range(30):
        p, cs = move(pos, cs, jnp.array(False))
        pos = pos.at[0].set(p)
    plain = float(pos[0, 0]) - x0
    # dash: one press then hold motion 30 frames
    x1 = float(pos[0, 0])
    p, cs = move(pos, cs, jnp.array(True))
    pos = pos.at[0].set(p)
    for _ in range(29):
        p, cs = move(pos, cs, jnp.array(False))
        pos = pos.at[0].set(p)
    dashed = float(pos[0, 0]) - x1
    assert dashed > plain * 1.3
    # after cooldown the timer resets
    for _ in range(150):
        p, cs = move(pos, cs, jnp.array(False))
        pos = pos.at[0].set(p)
    assert float(cs.dash_time) < 0
