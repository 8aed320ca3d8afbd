"""Physics world tests: rest, bounce, friction, sweeps, ground collide,
character controller basics. Golden behavior checks on analytic scenes
(a flat or sloped heightfield) — the ODE-replacement acceptance tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clap_tpu.physics.heightfield import make_heightfield
from clap_tpu.physics.narrowphase import make_world, raycast_down, capsule_world_contacts
from clap_tpu.physics import world as W
from clap_tpu.physics.sweep import sweep_capsule
from clap_tpu.char import controller as C


def flat_world(h=0.0, n=17, side=32.0):
    xs = np.linspace(0, 1, n)
    H = np.full((n, n), h, np.float32)
    N = np.zeros((n, n, 3), np.float32)
    N[..., 1] = 1.0
    hf = make_heightfield(H, N, [-side / 2, -side / 2], side)
    return make_world(hf)


def slope_world(slope=0.3, n=33, side=32.0):
    xs = np.linspace(-side / 2, side / 2, n).astype(np.float32)
    H = np.broadcast_to(slope * xs[:, None], (n, n)).astype(np.float32)
    N = np.zeros((n, n, 3), np.float32)
    nv = np.array([-slope, 1.0, 0.0]) / np.sqrt(1 + slope**2)
    N[:] = nv
    hf = make_heightfield(H, N, [-side / 2, -side / 2], side)
    return make_world(hf)


def one_sphere(r=0.5, pos=(0, 5, 0), bounce=0.0, bounce_vel=0.0, mu=1.0, n=4):
    params = W.body_params_empty(n)
    params = params._replace(
        active=params.active.at[0].set(True),
        radius=params.radius.at[0].set(r),
        bounce=params.bounce.at[0].set(bounce),
        bounce_vel=params.bounce_vel.at[0].set(bounce_vel),
        mu=params.mu.at[0].set(mu),
        yoffset=params.yoffset.at[0].set(r),
        ray_off=params.ray_off.at[0].set(r),
    )
    params = W.finalize_inertia(params)
    st = W.phys_state_init(n)
    st = st._replace(pos=st.pos.at[0].set(jnp.array(pos, jnp.float32)))
    return params, st


def run_steps(world, params, st, frames, dt=1 / 60):
    step = jax.jit(lambda s: W.phys_step(world, params, s, dt))
    for _ in range(frames):
        st = step(st)
    return st


def test_sphere_rests_on_ground():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 3, 0))
    st = run_steps(world, params, st, 240)
    # rest height = ground + radius
    assert abs(float(st.pos[0, 1]) - 0.5) < 2e-2
    assert float(jnp.linalg.norm(st.vel[0])) < 0.06
    assert bool(st.disabled[0])  # auto-disabled at rest


def test_sphere_bounces():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 3, 0), bounce=0.8, bounce_vel=0.1)
    ys = []
    step = jax.jit(lambda s: W.phys_step(world, params, s, 1 / 60))
    for _ in range(300):
        st = step(st)
        ys.append(float(st.pos[0, 1]))
    ys = np.array(ys)
    # must leave the ground again after the FIRST touch-down
    touch = int(np.argmax(ys < 0.7))
    assert ys[touch] < 0.7
    assert ys[touch:].max() > ys[touch] + 0.3
    # rebound speed ≈ bounce * impact speed: apex ≈ (0.8·7)²/(2g) ≈ 1.6
    assert ys[touch:].max() > 1.2


def test_free_fall_matches_analytic():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 50, 0))
    dt = 1 / 120  # one substep per frame
    step = jax.jit(lambda s: W.phys_step(world, params, s, dt))
    for _ in range(60):
        st = step(st)
    t = 60 * dt
    # symplectic Euler with damping ~ analytic within small tolerance
    y_ref = 50 - 0.5 * 9.8 * t * t
    assert abs(float(st.pos[0, 1]) - y_ref) < 0.12


def test_friction_converts_slide_to_roll():
    # ODE semantics: contact friction on a sliding sphere transfers
    # momentum into spin until rolling without slipping at v = 5/7 v0
    # (it does NOT stop — there is no rolling resistance)
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 0.5, 0), mu=1.0)
    st = st._replace(vel=st.vel.at[0].set(jnp.array([4.0, 0, 0], jnp.float32)))
    st = run_steps(world, params, st, 30)
    v = float(st.vel[0, 0])
    # 5/7·v0 = 2.857, shaved slightly by the ODE-matched 1e-3/substep
    # linear damping over the half second
    assert 2.55 < v < 2.87, v
    w = np.asarray(st.angvel[0])
    assert abs(-w[2] * 0.5 - v) / v < 0.01  # rolling: v = ω×r
    # frictionless keeps sliding
    params2 = params._replace(mu=params.mu.at[0].set(0.0))
    _, st2 = one_sphere(r=0.5, pos=(0, 0.5, 0))
    st2 = st2._replace(vel=st2.vel.at[0].set(jnp.array([4.0, 0, 0], jnp.float32)))
    st2 = run_steps(world, params2, st2, 60)
    assert float(st2.vel[0, 0]) > 3.0


def test_raycast_down():
    world = flat_world(h=1.0)
    d, n, hit, ent = raycast_down(world, jnp.array([0.0, 4.0, 0.0]), 10.0)
    assert bool(hit) and abs(float(d) - 3.0) < 1e-5
    np.testing.assert_allclose(np.asarray(n), [0, 1, 0], atol=1e-6)
    assert int(ent) == 0  # heightfield → terrain entity
    d2, _, hit2, ent2 = raycast_down(world, jnp.array([0.0, 4.0, 0.0]), 2.0)
    assert not bool(hit2)
    assert int(ent2) == -1


def test_capsule_contacts_on_slope():
    world = slope_world(slope=0.5)
    # capsule bottom sphere penetrating the slope at x=0 (h=0)
    p = jnp.array([0.0, 0.65, 0.0])  # r=0.5, half_len=0.25: bottom sphere at 0.4
    c = capsule_world_contacts(world, p - jnp.array([0, 0.25, 0]),
                               p + jnp.array([0, 0.25, 0]), 0.5)
    assert bool(jnp.any(c.valid))
    d, n, pt, ok = __import__("clap_tpu.physics.narrowphase", fromlist=["deepest_contact"]).deepest_contact(c)
    nv = np.array([-0.5, 1.0, 0.0]) / np.sqrt(1.25)
    np.testing.assert_allclose(np.asarray(n), nv, atol=1e-3)


def test_sweep_stops_at_wall():
    # wall: two triangles at x=2 plane facing -x
    wallq = np.array([
        [[2, -5, -5], [2, 5, -5], [2, 5, 5]],
        [[2, -5, -5], [2, 5, 5], [2, -5, 5]],
    ], dtype=np.float32)
    world = make_world(flat_world().hf, jnp.asarray(wallq))
    params, st = one_sphere(r=0.5, pos=(0, 0.5, 0))
    sweep12 = jax.jit(lambda bp, d: sweep_capsule(world, params, bp,
                                                  jnp.int32(0), d,
                                                  max_steps=12))
    res = sweep12(st.pos, jnp.array([3.0, 0.0, 0.0], jnp.float32))
    # C uses ceil(3.0/(r/2)) = 12 steps
    assert bool(res.hit)
    # safe distance is 1.5 (wall at 2, radius 0.5) → frac = 0.5
    assert abs(float(res.frac) - 0.5) < 0.15
    np.testing.assert_allclose(np.asarray(res.normal), [-1, 0, 0], atol=1e-4)


def test_sweep_no_obstacle():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 0.5, 0))
    res = jax.jit(lambda bp, d: sweep_capsule(world, params, bp,
                                              jnp.int32(0), d))(
        st.pos, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    assert float(res.frac) == 1.0


def make_char(world, pos=(0.0, 1.0, 0.0)):
    n = 4
    params = W.body_params_empty(n)
    r, hl, yoff, ray_off = W.capsule_auto_size(0.6, 2.0, 0.6)
    params = params._replace(
        active=params.active.at[0].set(True),
        kinematic=params.kinematic.at[0].set(True),
        radius=params.radius.at[0].set(r),
        half_len=params.half_len.at[0].set(hl),
        yoffset=params.yoffset.at[0].set(yoff),
        ray_off=params.ray_off.at[0].set(ray_off),
    )
    st = W.phys_state_init(n)
    geom_pos = jnp.array(pos, jnp.float32) + jnp.array([0, yoff, 0], jnp.float32)
    st = st._replace(pos=st.pos.at[0].set(geom_pos))
    cp = C.CharParams(body=jnp.int32(0), lin_speed=jnp.float32(2.0),
                      jump_forward=jnp.float32(1.0), jump_upward=jnp.float32(4.0),
                      can_dash=jnp.array(True))
    cs = C.char_state_init()
    return params, st, cp, cs


def test_character_walks_on_flat():
    world = flat_world()
    params, st, cp, cs = make_char(world, pos=(0.0, 0.0, 0.0))
    move = jax.jit(lambda pos, cs: C.character_move(
        world, params, cp, cs, pos, jnp.float32(1.0), jnp.float32(0.0),
        jnp.array(False), jnp.float32(1 / 60)))
    pos = st.pos
    for _ in range(60):
        p_new, cs = move(pos, cs)
        pos = pos.at[0].set(p_new)
    # walked ~ lin_speed * 1s in +x
    assert 1.2 < float(pos[0, 0]) < 2.4
    assert abs(float(pos[0, 1]) - float(params.yoffset[0])) < 0.1  # stays on ground
    assert int(cs.state) == C.CS_MOVING
    assert not bool(cs.airborne)


def test_character_falls_off_edge():
    # terrain only covers x in [-16, 16]; walk off the edge at +16
    world = flat_world()
    params, st, cp, cs = make_char(world, pos=(15.5, 0.0, 0.0))
    move = jax.jit(lambda pos, cs: C.character_move(
        world, params, cp, cs, pos, jnp.float32(1.0), jnp.float32(0.0),
        jnp.array(False), jnp.float32(1 / 60)))
    pos = st.pos
    for _ in range(240):
        p_new, cs = move(pos, cs)
        pos = pos.at[0].set(p_new)
    assert bool(cs.airborne)
    assert float(pos[0, 1]) < -5.0  # fell well below the plane
    assert int(cs.state) == C.CS_FALLING


def test_character_jump_arc():
    world = flat_world()
    params, st, cp, cs = make_char(world, pos=(0.0, 0.0, 0.0))
    move = jax.jit(lambda pos, cs, jump: C.character_move(
        world, params, cp, cs, pos, jnp.float32(0.0), jnp.float32(0.0),
        jump, jnp.float32(1 / 60)))
    pos = st.pos
    max_y = 0.0
    # frame 1 wakes the character (CS_START → CS_IDLE), frame 2 jumps
    for _ in range(2):
        p_new, cs = move(pos, cs, jnp.array(True))
        pos = pos.at[0].set(p_new)
    for i in range(120):
        p_new, cs = move(pos, cs, jnp.array(False))
        pos = pos.at[0].set(p_new)
        max_y = max(max_y, float(pos[0, 1]))
    # jumped: apex above standing height, then landed back
    stand = float(params.yoffset[0])
    assert max_y > stand + 0.3
    assert abs(float(pos[0, 1]) - stand) < 0.1
    assert not bool(cs.airborne)


def test_limbo_rescue():
    cs = C.char_state_init()
    cs = cs._replace(history=cs.history.at[0].set(jnp.array([1.0, 2.0, 3.0])),
                     hist_head=jnp.int32(1))
    pos = jnp.array([1.0, -100.0, 3.0])
    new_pos, cs2, fell = C.limbo_rescue(cs, pos, jnp.float32(30.0))
    assert bool(fell)
    np.testing.assert_allclose(np.asarray(new_pos), [1, 2, 3], atol=1e-6)


def test_character_on_slope_walks_uphill():
    """Slope-aligned ground basis (character.c:500-527): walking +x on an
    x-slope gains height along the surface."""
    world = slope_world(slope=0.3)
    params, st, cp, cs = make_char(world, pos=(0.0, 0.0, 0.0))
    # place on the slope surface at x=0 (h=0)
    move = jax.jit(lambda pos, cs: C.character_move(
        world, params, cp, cs, pos, jnp.float32(1.0), jnp.float32(0.0),
        jnp.array(False), jnp.float32(1 / 60)))
    pos = st.pos
    for _ in range(90):
        p, cs = move(pos, cs)
        pos = pos.at[0].set(p)
    p = np.asarray(pos[0])
    assert p[0] > 1.0                       # moved along +x
    # stayed glued to the slope: geom height ≈ surface + yoffset
    expect_y = 0.3 * p[0] + float(params.yoffset[0])
    assert abs(p[1] - expect_y) < 0.15
    assert not bool(cs.airborne)


def test_character_blocked_by_wall():
    """Grounded sweep blocks on a wall (stop_on_block, character.c:193+)."""
    wall = np.array([
        [[2, -5, -5], [2, 5, 5], [2, 5, -5]],
        [[2, -5, -5], [2, -5, 5], [2, 5, 5]],
    ], np.float32)  # normal -x, facing the character
    world = make_world(flat_world().hf, jnp.asarray(wall))
    params, st, cp, cs = make_char(world, pos=(0.0, 0.0, 0.0))
    move = jax.jit(lambda pos, cs: C.character_move(
        world, params, cp, cs, pos, jnp.float32(1.0), jnp.float32(0.0),
        jnp.array(False), jnp.float32(1 / 60)))
    pos = st.pos
    for _ in range(120):
        p, cs = move(pos, cs)
        pos = pos.at[0].set(p)
    # stopped at the wall minus capsule radius, didn't tunnel
    assert float(pos[0, 0]) < 2.0 - float(params.radius[0]) + 0.1
    assert float(pos[0, 0]) > 1.0


def test_integrator_matches_symplectic_euler_exactly():
    """The substep is symplectic Euler with ODE's damping: v' = (v+g·h)
    ·(1-d), x' = x + v'·h. Free fall must match the closed form to float
    precision (the trajectory-parity bar from BASELINE)."""
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 500, 0))  # far above ground
    sub = jax.jit(lambda s: W._substep(world, params, s, W.FIXED_DT))
    # closed-form recurrence in float32
    v = np.float32(0.0)
    y = np.float32(500.0)
    h = np.float32(W.FIXED_DT)
    d = np.float32(1.0 - W.LINEAR_DAMPING)
    g = np.float32(-9.8)
    for i in range(120):
        st = sub(st)
        v = (v + g * h) * d
        y = y + v * h
    assert abs(float(st.pos[0, 1]) - float(y)) < 1e-3
    assert abs(float(st.vel[0, 1]) - float(v)) < 1e-4


def test_two_characters_sequential():
    """Multiple characters per scene update sequentially (scene.c walk):
    both walk, they collide with each other via the sweep body contacts."""
    world = flat_world()
    n = 4
    params = W.body_params_empty(n)
    r, hl, yoff, ray_off = W.capsule_auto_size(0.6, 2.0, 0.6)
    for i in (0, 1):
        params = params._replace(
            active=params.active.at[i].set(True),
            kinematic=params.kinematic.at[i].set(True),
            radius=params.radius.at[i].set(r),
            half_len=params.half_len.at[i].set(hl),
            yoffset=params.yoffset.at[i].set(yoff),
            ray_off=params.ray_off.at[i].set(ray_off),
        )
    st = W.phys_state_init(n)
    st = st._replace(pos=st.pos.at[0].set(jnp.array([0.0, yoff, 0.0]))
                     .at[1].set(jnp.array([4.0, yoff, 0.0])))
    cp = C.CharParams(body=jnp.array([0, 1], jnp.int32),
                      lin_speed=jnp.full((2,), 2.0, jnp.float32),
                      jump_forward=jnp.full((2,), 1.0, jnp.float32),
                      jump_upward=jnp.full((2,), 4.0, jnp.float32),
                      can_dash=jnp.ones((2,), bool))
    css = [C.char_state_init(), C.char_state_init()]

    @jax.jit
    def move_both(pos, cs0, cs1):
        # char 0 walks +x, char 1 walks -x (head-on)
        c0 = jax.tree.map(lambda x: x[0], cp)
        c1 = jax.tree.map(lambda x: x[1], cp)
        p0, cs0 = C.character_move(world, params, c0, cs0, pos,
                                   jnp.float32(1.0), jnp.float32(0.0),
                                   jnp.array(False), jnp.float32(1 / 60))
        pos = pos.at[0].set(p0)
        p1, cs1 = C.character_move(world, params, c1, cs1, pos,
                                   jnp.float32(-1.0), jnp.float32(0.0),
                                   jnp.array(False), jnp.float32(1 / 60))
        pos = pos.at[1].set(p1)
        return pos, cs0, cs1

    pos = st.pos
    for _ in range(180):
        pos, css[0], css[1] = move_both(pos, css[0], css[1])
    p = np.asarray(pos)
    # they approached but the sweep body-contacts keep them separated by
    # at least ~2r (they can slide around each other, so check distance)
    gap = np.linalg.norm(p[0] - p[1])
    assert gap > 2 * float(params.radius[0]) * 0.8
    # both actually moved from their spawns
    assert p[0, 0] > 0.3 and p[1, 0] < 3.7


# ---------------------------------------------------------------------------
# rigid-body angular dynamics (rotation sync: physics.c:789-811)
# ---------------------------------------------------------------------------

def test_sphere_rolls_down_incline_5_7_law():
    """A solid sphere released on a frictional incline rolls without
    slipping: a = g·sinθ / (1 + I/(m r²)) = (5/7)·g·sinθ."""
    slope = 0.25
    world = slope_world(slope)
    r = 0.5
    params, st = one_sphere(r=r, pos=(0, 0, 0), mu=1.5)
    params = W.finalize_inertia(params)
    # place exactly resting on the slope at x=0: surface point (0, 0)
    # with unit normal n; center = r·n
    nv = np.array([-slope, 1.0, 0.0]) / np.sqrt(1 + slope * slope)
    st = st._replace(pos=st.pos.at[0].set(jnp.asarray(r * nv, jnp.float32)))

    frames = 45  # 0.75 s (before it rolls far enough to matter)
    st = run_steps(world, params, st, frames)
    t = frames / 60.0
    sin_t = slope / np.sqrt(1 + slope * slope)
    v_expect = (5.0 / 7.0) * 9.8 * sin_t * t
    v = np.asarray(st.vel[0])
    speed = np.linalg.norm(v[[0, 1]])
    assert speed == pytest.approx(v_expect, rel=0.12), (speed, v_expect)
    # rolling without slipping: |ω| ≈ v/r about the z axis
    w = np.asarray(st.angvel[0])
    assert abs(np.linalg.norm(w) - speed / r) / (speed / r) < 0.15
    assert abs(w[2]) > 10 * abs(w[0]) and abs(w[2]) > 10 * abs(w[1])
    # orientation actually integrates (the quat left identity)
    q = np.asarray(st.quat[0])
    assert abs(q[3]) < 0.999


def test_sphere_rest_no_spin():
    """A sphere resting on flat ground stays unrotated."""
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 0.5, 0))
    params = W.finalize_inertia(params)
    st = run_steps(world, params, st, 90)
    assert np.linalg.norm(np.asarray(st.angvel[0])) < 0.05
    q = np.asarray(st.quat[0])
    assert abs(q[3]) > 0.999


def test_capsule_topples_and_lies_down():
    """An upright capsule given a shove at the top tips over and comes
    to rest lying on the ground (rotating collision geometry)."""
    world = flat_world()
    n = 4
    r, hl = 0.25, 0.5
    params = W.body_params_empty(n)
    params = params._replace(
        active=params.active.at[0].set(True),
        radius=params.radius.at[0].set(r),
        half_len=params.half_len.at[0].set(hl),
        yoffset=params.yoffset.at[0].set(r + hl),
        ray_off=params.ray_off.at[0].set(r + hl / 2),
        mu=params.mu.at[0].set(1.0),
    )
    params = W.finalize_inertia(params)
    st = W.phys_state_init(n)
    st = st._replace(
        pos=st.pos.at[0].set(jnp.array([0.0, r + hl, 0.0])),
        angvel=st.angvel.at[0].set(jnp.array([0.0, 0.0, 3.0])),
    )
    st = run_steps(world, params, st, 240)
    # lying: center height ≈ r (segment horizontal), axis ⟂ y
    y = float(st.pos[0, 1])
    assert y < r + 0.55 * hl, y
    import clap_tpu.mathx as mx
    axis = np.asarray(mx.qrot(st.quat[0], jnp.array([0.0, 1.0, 0.0])))
    assert abs(axis[1]) < 0.45, axis


def test_rotation_syncs_to_entity_matrix():
    """game/engine step writes the body quaternion into the entity's
    world matrix (phys_body_update → model.c:1665)."""
    from clap_tpu.scene.testbed import build_testbed
    from clap_tpu.engine.step import engine_step, inputs_zero

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    # give dynamic body 1 (entity 2) a spin
    st = tb.state0
    st = st._replace(phys=st.phys._replace(
        angvel=st.phys.angvel.at[1].set(jnp.array([0.0, 2.0, 0.0]))))
    ins = inputs_zero(1)
    step = jax.jit(lambda s: engine_step(tb.cfg, s, ins))
    for _ in range(30):
        st = step(st)
    m = np.asarray(st.mx[2])  # entity 2 = first dynamic body
    # rotation part is no longer identity
    assert not np.allclose(m[:3, :3] / max(np.linalg.norm(m[:3, 0]), 1e-6),
                           np.eye(3), atol=5e-2)
