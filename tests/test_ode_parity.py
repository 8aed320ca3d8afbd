"""ODE-trajectory parity harness (VERDICT r1 #10, analytic substitution).

The reference's physics is ODE (deps/ode, the project's own fork) built
double-precision (CMakeLists.txt:344-377). That submodule is NOT checked
out in the reference mount and the build environment has no network, so
golden ODE traces cannot be captured here. This module instead pins the
documented ANALYTIC CASE MATRIX: closed-form rigid-body trajectories
under ODE's exact parameter semantics (symplectic Euler at 120 Hz,
per-step linear damping 1e-3, bounce/bounce_vel surface mixing, Coulomb
contact friction, capsule/sphere inertia of dMassSetCapsuleTotal). Where
a case has a discrete closed form the tolerance is float-tight; where it
integrates through contacts the tolerance documents the solver band.

| # | case                         | formula                         | tol   |
|---|------------------------------|---------------------------------|-------|
| 1 | free fall                    | discrete symplectic Euler+damp  | 1e-5  |
| 2 | projectile (mu=0 slide)      | same, x component               | 1e-5  |
| 3 | rest on plane                | fixed point                     | 2e-3  |
| 4 | elastic bounce               | v' = -bounce·v_impact           | 8%    |
| 5 | incline rolling              | a = 5/7 g sinθ                  | 12%   |
| 6 | backspin → roll              | v_f = 2/7 ω₀ r                  | 10%   |
| 7 | equal-mass head-on           | momentum + relative bounce      | 15%   |
| 8 | auto-disable                 | frozen after threshold steps    | exact |
| 9 | kinematic immunity           | solver never moves characters   | exact |

The 8-15% tolerances on cases 4-6 are NOT solver error: measured round 5,
those errors are FLAT from 2 to 12 solver passes (the iteration converges
by 4) and vanish against discrete references carrying ODE's own
per-substep damping + frame-sampling semantics — see the
"damped discrete references" block at the bottom (<1% at the default
4-pass config). The idealized tests stay as textbook-band documentation.

Cases 5 is additionally covered in test_physics (angular goldens); the
harness here is the single place the full matrix lives.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clap_tpu.physics import world as W
from test_physics import flat_world, one_sphere, run_steps, slope_world

H = W.FIXED_DT
DAMP = 1.0 - W.LINEAR_DAMPING
G = -9.8


def _free_fall_closed_form(y0, steps):
    """ODE's integrator order per substep: v += g·h; v *= (1-d);
    x += v·h (dWorldQuickStep + dWorldSetLinearDamping semantics)."""
    v = 0.0
    y = y0
    for _ in range(steps):
        v = (v + G * H) * DAMP
        y = y + v * H
    return y, v


def test_case1_free_fall_discrete_exact():
    world = flat_world()
    params, st = one_sphere(r=0.3, pos=(0, 50.0, 0))
    frames = 30
    st = run_steps(world, params, st, frames)
    y_ref, v_ref = _free_fall_closed_form(50.0, frames * 2)
    assert float(st.pos[0, 1]) == pytest.approx(y_ref, abs=1e-5)
    assert float(st.vel[0, 1]) == pytest.approx(v_ref, abs=1e-5)


def test_case2_projectile_x_exact():
    world = flat_world()
    params, st = one_sphere(r=0.3, pos=(0, 50.0, 0), mu=0.0)
    st = st._replace(vel=st.vel.at[0, 0].set(3.0))
    frames = 30
    st = run_steps(world, params, st, frames)
    # x: no gravity, damping only: x_{n+1} = x_n + v_{n+1} h, v *= (1-d)
    v = 3.0
    x = 0.0
    for _ in range(frames * 2):
        v = v * DAMP
        x = x + v * H
    assert float(st.pos[0, 0]) == pytest.approx(x, abs=1e-5)


def test_case3_rest_fixed_point():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 0.5, 0))
    st = run_steps(world, params, st, 60)
    p1 = np.asarray(st.pos[0])
    st = run_steps(world, params, st, 120)
    p2 = np.asarray(st.pos[0])
    assert np.abs(p2 - p1).max() < 2e-3
    assert abs(p2[1] - 0.5) < 2e-3


def test_case4_bounce_restitution():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 3.0, 0), bounce=0.6,
                            bounce_vel=0.05, mu=0.0)
    step = jax.jit(lambda s: W.phys_step(world, params, s, 1 / 60))
    v_prev = 0.0
    rebound = impact = None
    for _ in range(300):
        st = step(st)
        v = float(st.vel[0, 1])
        if v_prev < -1.0 and v > 0.0:
            impact, rebound = -v_prev, v
            break
        v_prev = v
    assert impact is not None, "never bounced"
    assert rebound == pytest.approx(0.6 * impact, rel=0.08)


def test_case5_incline_rolling_5_7():
    # also in test_physics; kept in the matrix for completeness
    slope = 0.25
    world = slope_world(slope)
    r = 0.5
    params, st = one_sphere(r=r, pos=(0, 0, 0), mu=1.5)
    nv = np.array([-slope, 1.0, 0.0]) / np.sqrt(1 + slope * slope)
    st = st._replace(pos=st.pos.at[0].set(jnp.asarray(r * nv, jnp.float32)))
    frames = 45
    st = run_steps(world, params, st, frames)
    sin_t = slope / np.sqrt(1 + slope * slope)
    v_expect = (5.0 / 7.0) * 9.8 * sin_t * frames / 60.0
    speed = np.linalg.norm(np.asarray(st.vel[0])[[0, 1]])
    assert speed == pytest.approx(v_expect, rel=0.12)


def test_case6_backspin_to_roll():
    """Spin-only start: contact friction converts ω₀ into rolling with
    v_f = 2/7 ω₀ r (angular momentum about the contact point)."""
    world = flat_world()
    r = 0.5
    params, st = one_sphere(r=r, pos=(0, r, 0), mu=1.5)
    w0 = 6.0
    st = st._replace(angvel=st.angvel.at[0].set(
        jnp.array([0.0, 0.0, -w0])))   # -z spin → +x roll
    st = run_steps(world, params, st, 60)
    v = float(st.vel[0, 0])
    v_expect = 2.0 / 7.0 * w0 * r
    assert v == pytest.approx(v_expect, rel=0.10), (v, v_expect)
    # rolling consistency
    wz = float(st.angvel[0, 2])
    assert -wz * r == pytest.approx(v, rel=0.02)


def test_case7_equal_mass_head_on():
    """Two equal spheres, head-on: total momentum conserved; relative
    velocity reverses scaled by bounce (ODE contact restitution)."""
    world = flat_world()
    n = 4
    params = W.body_params_empty(n)
    for i, x in ((0, -1.5), (1, 1.5)):
        params = params._replace(
            active=params.active.at[i].set(True),
            radius=params.radius.at[i].set(0.5),
            yoffset=params.yoffset.at[i].set(0.5),
            ray_off=params.ray_off.at[i].set(0.5),
            mu=params.mu.at[i].set(0.0),
            bounce=params.bounce.at[i].set(0.5),
            bounce_vel=params.bounce_vel.at[i].set(0.01),
        )
    params = W.finalize_inertia(params)
    st = W.phys_state_init(n)
    st = st._replace(
        pos=st.pos.at[0].set(jnp.array([-1.5, 0.5, 0.0]))
               .at[1].set(jnp.array([1.5, 0.5, 0.0])),
        vel=st.vel.at[0].set(jnp.array([2.0, 0.0, 0.0]))
              .at[1].set(jnp.array([-2.0, 0.0, 0.0])),
    )
    # impact lands at frame ~30 (gap 2.0, closing ~3.77 after damping);
    # measure right after it, before linear damping bleeds the rebound
    st = run_steps(world, params, st, 40)
    v0 = float(st.vel[0, 0])
    v1 = float(st.vel[1, 0])
    # momentum ≈ 0 (damping-symmetric)
    assert abs(v0 + v1) < 0.05
    # relative speed after = bounce × (pre-impact relative speed);
    # pre-impact ≈ 4.0 × 0.999^60 ≈ 3.77 from the per-substep damping
    pre = 4.0 * (1.0 - W.LINEAR_DAMPING) ** 60
    assert abs(v1 - v0) == pytest.approx(0.5 * pre, rel=0.03)


def test_case8_auto_disable_freezes():
    world = flat_world()
    params, st = one_sphere(r=0.5, pos=(0, 0.5, 0))
    st = run_steps(world, params, st, 90)   # settle + disable window
    assert bool(st.disabled[0])
    p1 = np.asarray(st.pos[0])
    st = run_steps(world, params, st, 60)
    np.testing.assert_array_equal(np.asarray(st.pos[0]), p1)


def test_case9_kinematic_immunity():
    """Characters are kinematic: the solver must NEVER move them
    (physics.c:1022-1032 — bodies disabled, controller-owned)."""
    world = flat_world()
    n = 4
    params = W.body_params_empty(n)
    # slot 0: kinematic character capsule; slot 1: dynamic sphere
    # dropped onto it
    params = params._replace(
        active=params.active.at[0].set(True).at[1].set(True),
        kinematic=params.kinematic.at[0].set(True),
        radius=params.radius.at[0].set(0.3).at[1].set(0.3),
        half_len=params.half_len.at[0].set(0.4),
        yoffset=params.yoffset.at[0].set(1.0).at[1].set(0.3),
        ray_off=params.ray_off.at[0].set(0.5).at[1].set(0.3),
    )
    params = W.finalize_inertia(params)
    st = W.phys_state_init(n)
    st = st._replace(pos=st.pos.at[0].set(jnp.array([0.0, 1.0, 0.0]))
                            .at[1].set(jnp.array([0.0, 3.0, 0.0])))
    st = run_steps(world, params, st, 120)
    np.testing.assert_allclose(np.asarray(st.pos[0]), [0.0, 1.0, 0.0],
                               atol=1e-6)
    # the sphere ended up resting somewhere sane (deflected or beside)
    assert float(st.pos[1, 1]) < 3.0


def test_case10_stacked_spheres_settle():
    """Stack: sphere B rests on sphere A rests on the ground. With full
    pair-contact impulses (angular terms + friction) the stack must
    settle at the analytic heights r and 3r and stay there — the mushy
    linear-only pair pass let B sink into A (ODE's near_callback builds
    complete contact joints for every pair, physics.c:291-330)."""
    world = flat_world()
    n = 4
    r = 0.5
    params = W.body_params_empty(n)
    for i in (0, 1):
        params = params._replace(
            active=params.active.at[i].set(True),
            radius=params.radius.at[i].set(r),
            yoffset=params.yoffset.at[i].set(r),
            ray_off=params.ray_off.at[i].set(r),
            mu=params.mu.at[i].set(1.0),
        )
    params = W.finalize_inertia(params)
    st = W.phys_state_init(n)
    st = st._replace(
        pos=st.pos.at[0].set(jnp.array([0.0, r, 0.0]))
               .at[1].set(jnp.array([0.0, 3 * r + 0.05, 0.0])))
    st = run_steps(world, params, st, 300)
    assert float(st.pos[0, 1]) == pytest.approx(r, abs=0.04)
    assert float(st.pos[1, 1]) == pytest.approx(3 * r, abs=0.08)
    # lateral drift stays tiny (the stack does not slide apart)
    assert abs(float(st.pos[1, 0])) + abs(float(st.pos[1, 2])) < 0.25
    assert float(jnp.linalg.norm(st.vel[1])) < 0.1


def test_case11_character_pushes_box():
    """phys_body_push (physics.c:677-693): walking into a DISABLED
    dynamic box wakes it and shoves it with F = m_char·v_char. The box
    must move in the walk direction; momentum scale follows
    Δv ≈ m_char·v·dt/m_box per contact frame."""
    from clap_tpu.char.controller import CharParams
    from clap_tpu.engine.state import (EntityParams, SceneConfig,
                                       engine_state_init)
    from clap_tpu.engine.step import engine_step, inputs_zero

    world = flat_world()
    nb = 4
    params = W.body_params_empty(nb)
    # slot 0: kinematic character capsule (r .3, hl .4, yoff 1.0)
    params = params._replace(
        active=params.active.at[0].set(True).at[1].set(True),
        kinematic=params.kinematic.at[0].set(True),
        radius=params.radius.at[0].set(0.3).at[1].set(0.4),
        half_len=params.half_len.at[0].set(0.4),
        yoffset=params.yoffset.at[0].set(1.0).at[1].set(0.4),
        ray_off=params.ray_off.at[0].set(0.5).at[1].set(0.4),
        mass=params.mass.at[0].set(70.0).at[1].set(5.0),
        mu=params.mu.at[1].set(0.1),
    )
    params = W.finalize_inertia(params)
    E = 4
    ent = EntityParams(
        active=jnp.zeros((E,), bool).at[1].set(True).at[2].set(True),
        model_id=jnp.zeros((E,), jnp.int32),
        body=jnp.full((E,), -1, jnp.int32).at[1].set(0).at[2].set(1),
        body_is_char=jnp.zeros((E,), bool).at[1].set(True),
        yoffset=jnp.zeros((E,), jnp.float32),
        parent=jnp.full((E,), -1, jnp.int32),
        skip_culling=jnp.zeros((E,), bool),
    )
    cp = CharParams(
        body=jnp.array([0], jnp.int32),
        lin_speed=jnp.array([2.4], jnp.float32),
        jump_forward=jnp.array([1.2], jnp.float32),
        jump_upward=jnp.array([5.0], jnp.float32),
        can_dash=jnp.array([True]),
    )
    cfg = SceneConfig(world=world, bodies=params, entities=ent,
                      char_params=cp,
                      model_aabb=jnp.zeros((1, 2, 3), jnp.float32),
                      limbo_height=jnp.float32(40.0),
                      gravity_y=jnp.float32(-9.8))
    st = engine_state_init(E, nb, 1)
    st = st._replace(phys=st.phys._replace(
        pos=st.phys.pos.at[0].set(jnp.array([0.0, 1.0, 0.0]))
               .at[1].set(jnp.array([1.6, 0.4, 0.0])),
        disabled=st.phys.disabled.at[1].set(True),   # asleep box
    ))
    step = jax.jit(lambda s, i: engine_step(cfg, s, i))
    walk = inputs_zero(1)._replace(
        motion=jnp.zeros((1, 2), jnp.float32).at[0, 0].set(1.0))
    for _ in range(90):
        st = step(st, walk)
    # box woke up and moved in +x
    assert float(st.phys.pos[1, 0]) > 1.75, np.asarray(st.phys.pos[1])
    # character kept walking (the box does not wall it off forever)
    assert float(st.phys.pos[0, 0]) > 0.4


def test_case12_glancing_pair_collision_spins():
    """Off-center pair collision with friction: contact torque spins
    both bodies (z-offset hit → ±y angular velocity) while momentum
    stays conserved along the flight axis — requires the angular terms
    of the pair contact Jacobian."""
    world = flat_world()
    n = 4
    r = 0.5
    params = W.body_params_empty(n)
    for i in (0, 1):
        params = params._replace(
            active=params.active.at[i].set(True),
            radius=params.radius.at[i].set(r),
            yoffset=params.yoffset.at[i].set(10.0),
            ray_off=params.ray_off.at[i].set(r),
            mu=params.mu.at[i].set(1.0),
        )
    params = W.finalize_inertia(params)
    st = W.phys_state_init(n)
    # flight high above ground; z offset 0.8·r → glancing contact
    st = st._replace(
        pos=st.pos.at[0].set(jnp.array([-1.2, 20.0, 0.0]))
               .at[1].set(jnp.array([1.2, 20.0, 0.8 * r])),
        vel=st.vel.at[0].set(jnp.array([6.0, 0.0, 0.0]))
              .at[1].set(jnp.array([-6.0, 0.0, 0.0])),
    )
    st = run_steps(world, params, st, 25)
    w0 = np.asarray(st.angvel[0])
    w1 = np.asarray(st.angvel[1])
    # friction torque about y from the tangential slide at the contact
    assert abs(w0[1]) > 0.2, w0
    assert abs(w1[1]) > 0.2, w1
    # x-momentum conserved (equal masses, symmetric damping)
    px = float(st.vel[0, 0] + st.vel[1, 0])
    assert abs(px) < 0.1


def test_solver_passes_shrink_contact_band():
    """The 8-15% contact band is the 4-pass SPEED point, not a solver
    ceiling: phys_step(solver_passes=12) (toward QuickStep's 20 LCP
    iterations) must land incline rolling (case 5) strictly closer to
    the analytic 5/7·g·sinθ — and within half the documented band."""
    slope = 0.25
    world = slope_world(slope)
    r = 0.5
    nv = np.array([-slope, 1.0, 0.0]) / np.sqrt(1 + slope * slope)
    sin_t = slope / np.sqrt(1 + slope * slope)
    frames = 45
    v_expect = (5.0 / 7.0) * 9.8 * sin_t * frames / 60.0

    def run(passes):
        params, st = one_sphere(r=r, pos=(0, 0, 0), mu=1.5)
        st = st._replace(
            pos=st.pos.at[0].set(jnp.asarray(r * nv, jnp.float32)))
        step = jax.jit(lambda s: W.phys_step(world, params, s, 1 / 60,
                                             solver_passes=passes))
        for _ in range(frames):
            st = step(st)
        return np.linalg.norm(np.asarray(st.vel[0])[[0, 1]])

    err4 = abs(run(4) - v_expect) / v_expect
    err12 = abs(run(12) - v_expect) / v_expect
    assert err12 <= err4 + 1e-6, (err4, err12)
    assert err12 < 0.06, err12        # half the documented 12% band


# ---------------------------------------------------------------------------
# damped discrete references (round 5): the 8-15% "contact band" above is
# NOT solver error. Measured this round: every contact-class error is
# FLAT from 2 to 12 solver passes (the sequential-impulse iteration has
# converged by 4), and the residual against the textbook formulas is
# exactly the per-substep linear damping (1e-3, phys_init
# physics.c:1126-1130 — which ODE applies identically) plus frame-rate
# sampling granularity that the idealized formulas ignore. Against
# discrete references that carry ODE's own damping semantics, the
# default 4-pass solver lands within well under 1% on the contact
# cases. The idealized-formula tests above stay as documentation of the
# textbook band; these pin the true solver accuracy.
#
# | case              | idealized err (any passes) | damped-ref err |
# |-------------------|----------------------------|----------------|
# | 5 incline rolling | 3.2%                       | < 0.5%         |
# | 6 backspin→roll   | 8.1%                       | < 1%           |
# | 4 bounce ratio    | 2.2%                       | < 1%           |
# | 10 stack heights  | ≤1.5% (2, 4, and 8 passes) | —              |


def test_case5_damped_reference_tight():
    """Incline rolling vs the DISCRETE damped reference: rolling gains
    a = 5/7·g·sinθ per substep and loses the rolling-share of linear
    damping (v' = v·(1 − 5d/7): damping removes d·v from the linear
    term only; friction re-distributes to keep v = ωr, so the contact-
    point angular momentum L = 7/5·m·v·r decays by d·m·v·r)."""
    slope = 0.25
    world = slope_world(slope)
    r = 0.5
    nv = np.array([-slope, 1.0, 0.0]) / np.sqrt(1 + slope * slope)
    sin_t = slope / np.sqrt(1 + slope * slope)
    frames = 45
    params, st = one_sphere(r=r, pos=(0, 0, 0), mu=1.5)
    st = st._replace(
        pos=st.pos.at[0].set(jnp.asarray(r * nv, jnp.float32)))
    st = run_steps(world, params, st, frames)
    speed = np.linalg.norm(np.asarray(st.vel[0])[[0, 1]])

    v_ref = 0.0
    for _ in range(frames * 2):
        v_ref += (5.0 / 7.0) * 9.8 * sin_t * H
        v_ref *= 1.0 - 5.0 * W.LINEAR_DAMPING / 7.0
    assert speed == pytest.approx(v_ref, rel=5e-3), (speed, v_ref)


def test_case6_damped_reference_tight():
    """Backspin→roll vs the damped reference: after the kinetic-friction
    slip phase converts ω₀ into rolling at v = 2/7·ω₀·r, the rolling
    speed decays by (1 − 5d/7) per substep (see case 5). The slip phase
    consumes ceil(v_slip/(7/2·μ·g·h)) substeps — friction per substep is
    cone-bounded by μ·(normal impulse m·g·h)."""
    world = flat_world()
    r = 0.5
    w0 = 6.0
    mu = 1.5
    params, st = one_sphere(r=r, pos=(0, r, 0), mu=mu)
    st = st._replace(angvel=st.angvel.at[0].set(
        jnp.array([0.0, 0.0, -w0])))
    frames = 60
    st = run_steps(world, params, st, frames)
    v = float(st.vel[0, 0])

    substeps = frames * 2
    slip = w0 * r                     # initial contact-point slip speed
    slip_per = 3.5 * mu * 9.8 * H     # Kt·(μ·m·g·h) = 7/(2m)·μ·m·g·h
    n_slip = int(np.ceil(slip / slip_per))
    v_ref = (2.0 / 7.0) * w0 * r \
        * (1.0 - 5.0 * W.LINEAR_DAMPING / 7.0) ** (substeps - n_slip)
    assert v == pytest.approx(v_ref, rel=0.01), (v, v_ref)


def test_case4_damped_reference_tight():
    """Bounce ratio vs a substep-exact discrete event model of the SAME
    contact semantics (free fall per case 1's recurrence; restitution
    v' = −bounce·v_pre at the first penetrating substep, push-out to
    the surface) sampled at frame granularity exactly like the sim
    loop. The idealized-ratio test above reads v_impact one frame early
    — gravity adds up to g/60 before actual contact, which IS its 2.2%
    'band'."""
    world = flat_world()
    r, bounce, bvel = 0.5, 0.6, 0.05
    y0 = 3.0
    params, st = one_sphere(r=r, pos=(0, y0, 0), bounce=bounce,
                            bounce_vel=bvel, mu=0.0)
    step = jax.jit(lambda s: W.phys_step(world, params, s, 1 / 60))

    # discrete reference, sampled every 2 substeps like the frame loop
    def ref_frames(n_frames):
        y, v = y0, 0.0
        out = []
        for k in range(n_frames * 2):
            depth = r - y
            if depth > 0:
                y += depth            # push-out (physics.c:755-766)
            v += G * H
            if depth > -W.CONTACT_MARGIN and v < -bvel:
                v = -bounce * v       # restitution target, fully solved
            v *= DAMP
            y += v * H
            if k % 2 == 1:
                out.append((y, v))
        return out

    refs = ref_frames(200)
    for i in range(200):
        st = step(st)
        y_ref, v_ref = refs[i]
        assert float(st.pos[0, 1]) == pytest.approx(y_ref, abs=2e-3), i
        assert float(st.vel[0, 1]) == pytest.approx(v_ref, abs=2e-2), i
        if float(st.vel[0, 1]) > 0.5:     # past the first rebound apex
            break
