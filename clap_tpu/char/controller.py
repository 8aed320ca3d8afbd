"""Kinematic character controller (reference: core/character.c).

Pure-functional, batched re-design of the reference's sweep-and-slide
controller. Each character owns a body slot in the physics SoA; the
controller moves that body directly (characters are kinematic,
physics.c:1022-1032 — ODE's solver never touches them).

Divergent C control flow becomes fixed-trip masked loops:
- 3 slide iterations projecting the remainder onto the contact plane
  (character_sweep_delta, character.c:193-243)
- airborne split vertical/horizontal sweeps with floor-normal filter 0.5
  while falling, combined blocking sweep while rising
  (character_apply_velocity, character.c:267-301)
- ground collide with step-up/down snapping (phys_body_ground_collide,
  physics.c:695-744)
- animation state machine as int states with masked transitions
  (character_set_state, character.c:316-426). Transitions the C gates on
  transition-animation completion (JUMP_START → JUMPING via the
  idle_to_jump end-callback) fire after ``jump_start_frames`` frames
  instead; the animation layer can override per-clip timing.
- limbo rescue from an 8-slot grounded-position history ring
  (character.c:546-599)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..physics.narrowphase import StaticWorld, raycast_down
from ..physics.sweep import sweep_capsule
from ..physics.world import BodyParams, GRAVITY

# character_state (character.h:11-18)
CS_START = 0
CS_WAKING = 1
CS_IDLE = 2
CS_MOVING = 3
CS_JUMP_START = 4
CS_JUMPING = 5
CS_FALLING = 6

POS_HISTORY_MAX = 8
SLIDE_ITERS = 3
MOTION_COEFF_MOVING = 1.0
MOTION_COEFF_OTHER = 0.3   # character.c:508-513
GROUND_SAFETY = 0.05       # physics.c:706-712
GROUND_EPSILON = 1e-3
DT_CLAMP_MAX = 1.0 / 30.0  # character.c:252-254
JUMP_START_FRAMES = 6      # stand-in for the idle_to_jump clip length
DASH_MULT = 1.5            # character_dash (character.c:12-23)
DASH_DURATION = 1.0        # dashing ends after 1 s (character.c:43-49)
DASH_COOLDOWN = 2.0        # fully resets after 2 s (character.c:51-53)


class CharParams(NamedTuple):
    """Static per-character config (scene.json character block +
    defaults from character.c)."""

    body: jnp.ndarray          # int32 body slot index
    lin_speed: jnp.ndarray     # f32 units/s (entity AABB-Y * speed)
    jump_forward: jnp.ndarray  # f32
    jump_upward: jnp.ndarray   # f32
    can_dash: jnp.ndarray      # bool


class CharState(NamedTuple):
    """Dynamic per-character state."""

    velocity: jnp.ndarray      # (3,)
    normal: jnp.ndarray        # (3,) ground contact normal
    state: jnp.ndarray         # int32 CS_*
    airborne: jnp.ndarray      # bool
    jump: jnp.ndarray          # bool: input latch
    moved: jnp.ndarray         # int32 frames-moved counter
    jump_start_cnt: jnp.ndarray  # int32 frames left in JUMP_START
    collision: jnp.ndarray     # int32 ground entity/body id (-1 = none)
    push_body: jnp.ndarray     # int32 body slot the move swept into
                               # (-1 = none) — the phys_body_push target
    history: jnp.ndarray       # (POS_HISTORY_MAX, 3) grounded positions
    hist_head: jnp.ndarray     # int32
    hist_wrapped: jnp.ndarray  # bool
    dash_time: jnp.ndarray     # f32 seconds since dash start (-1 = off)


def char_state_init() -> CharState:
    return CharState(
        velocity=jnp.zeros(3, jnp.float32),
        normal=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        state=jnp.int32(CS_START),
        airborne=jnp.array(False),
        jump=jnp.array(False),
        moved=jnp.int32(0),
        jump_start_cnt=jnp.int32(0),
        collision=jnp.int32(-1),
        push_body=jnp.int32(-1),
        history=jnp.zeros((POS_HISTORY_MAX, 3), jnp.float32),
        hist_head=jnp.int32(0),
        hist_wrapped=jnp.array(False),
        dash_time=jnp.float32(-1.0),
    )


def _sweep_delta(world, params: BodyParams, body_pos, self_idx, delta,
                 min_normal_y, stop_on_block):
    """character_sweep_delta (character.c:193-243): ≤3 sweep-and-slide
    iterations. Returns (new_pos_self, first_frac)."""
    def it(carry, it_idx):
        pos, delta, first_frac, done, hit_body = carry
        live = ~done & (jnp.linalg.norm(delta) >= 1e-6)

        bp = body_pos.at[self_idx].set(pos)
        res = sweep_capsule(world, params, bp, self_idx, delta)
        frac = res.frac
        # normal filter: ignore wall/edge contacts on vertical sweeps
        frac = jnp.where((frac < 1.0) & (res.normal[1] < min_normal_y), 1.0, frac)
        first_frac = jnp.where(live & (it_idx == 0), frac, first_frac)
        # first dynamic body the sweep ran into (phys_body_sweep_capsule
        # reports it so the caller can shove it, physics.c:659-668)
        hit_body = jnp.where(live & (frac < 1.0) & (hit_body < 0),
                             res.hit_body, hit_body)

        pos = jnp.where(live, pos + delta * jnp.maximum(frac, 0.0), pos)

        stop = (frac >= 1.0) | ((frac <= 0.0) & stop_on_block)
        remaining = delta * (1.0 - frac)
        d = jnp.dot(remaining, res.normal)
        new_delta = remaining - d * res.normal
        delta = jnp.where(live & ~stop, new_delta, delta)
        done = done | (live & stop)
        return pos, delta, first_frac, done, hit_body

    # unrolled (3 fixed iterations): a lax.scan here becomes an XLA while
    # loop whose carry tuple is re-materialized through HBM every
    # iteration — straight-line code fuses into the surrounding step
    carry = (body_pos[self_idx], delta, jnp.float32(1.0), jnp.array(False),
             jnp.int32(-1))
    for i in range(SLIDE_ITERS):
        carry = it(carry, i)
    pos, _, first_frac, _, hit_body = carry
    return pos, first_frac, hit_body


def ground_collide(world: StaticWorld, params: BodyParams, pos, idx, grounded):
    """phys_body_ground_collide (physics.c:695-744). Returns
    (new_pos_self, grounded, ground_normal, hit, ground_entity)."""
    ray_off = params.ray_off[idx] - GROUND_SAFETY
    ray_len = params.yoffset[idx] - ray_off + GROUND_EPSILON
    p = pos[idx]
    origin = p - jnp.array([0.0, 1.0, 0.0]) * ray_off

    dist, normal, hit, ent = raycast_down(world, origin, 2.0 * ray_len)

    above = dist > ray_len
    below = dist < ray_len
    snap_down = grounded & above & hit
    snap_up = below & hit
    dy = jnp.where(snap_down, -(dist - ray_len), jnp.where(snap_up, ray_len - dist, 0.0))
    new_p = p + jnp.array([0.0, 1.0, 0.0]) * dy
    is_grounded = hit & ~(above & ~grounded)
    return new_p, is_grounded, normal, hit, ent


def character_move(world: StaticWorld, params: BodyParams,
                   cp: CharParams, cs: CharState,
                   body_pos, motion_dx, motion_dz, jump_input, dt,
                   dash_input=None):
    """character_move (character.c:450-537) for one character.

    body_pos: (N, 3) geom centers (this character's slot will be updated).
    Returns (new_body_pos_self, new CharState).
    """
    idx = cp.body
    dt = jnp.clip(dt, 0.0, DT_CLAMP_MAX)

    # --- ground collide + snap
    p_snap, grounded, gnormal, ghit, gent = ground_collide(
        world, params, body_pos, idx, ~cs.airborne
    )
    body_pos = body_pos.at[idx].set(p_snap)
    airborne = ~grounded
    # the ENTITY stood on (character.c:490-496 fires connect/disconnect
    # hooks off exactly this id)
    collision = jnp.where(grounded, gent, -1)

    # jump-rise protection (character.c:455-463)
    airborne = airborne | ((cs.state == CS_JUMPING) & (cs.velocity[1] > 0))

    velocity = cs.velocity
    state = cs.state
    jump_latch = cs.jump | jump_input

    # --- JUMP_START countdown (stand-in for transition animation)
    in_jump_start = state == CS_JUMP_START
    jcnt = jnp.where(in_jump_start, jnp.maximum(cs.jump_start_cnt - 1, 0),
                     cs.jump_start_cnt)
    to_jumping = in_jump_start & (jcnt == 0)
    state = jnp.where(to_jumping, CS_JUMPING, state)
    airborne = airborne | (to_jumping & (velocity[1] > 0))

    # --- airborne branch (character.c:465-484)
    vel_air = velocity.at[1].add(GRAVITY[1] * dt)
    rising = vel_air[1] > 0
    falling = airborne & ~rising

    # --- grounded motion setup
    motion = jnp.array([motion_dx, 0.0, motion_dz])
    has_motion = jnp.linalg.norm(motion) > 0

    # jump (character_jump): velocity = (dx*jf, ju, dz*jf), state=JUMP_START.
    # Only awake characters jump (C gates START→WAKING→IDLE on the wake
    # animation before input acts, character.c:319-326)
    do_jump = grounded & jump_latch & (state >= CS_IDLE) \
        & (state != CS_JUMP_START) & (state != CS_JUMPING)
    v_jump = jnp.array([
        motion_dx * cp.jump_forward, cp.jump_upward, motion_dz * cp.jump_forward
    ])

    # slope-aligned ground basis (character.c:500-527)
    newy = gnormal
    oldx = jnp.array([1.0, 0.0, 0.0])
    newz = jnp.cross(oldx, newy)
    newx = jnp.cross(newy, newz)
    newx = newx / jnp.maximum(jnp.linalg.norm(newx), 1e-9)
    newz = newz / jnp.maximum(jnp.linalg.norm(newz), 1e-9)
    mc = jnp.where(state == CS_MOVING, MOTION_COEFF_MOVING, MOTION_COEFF_OTHER)
    # dash (character_dash + character_motion_reset, character.c:12-67):
    # ×1.5 speed for DASH_DURATION, then cooldown until DASH_COOLDOWN;
    # idle clears the timer
    dash_in = jnp.array(False) if dash_input is None else dash_input
    dashing = cs.dash_time >= 0.0
    start = dash_in & cp.can_dash & ~dashing & grounded
    dash_t = jnp.where(start, 0.0,
                       jnp.where(dashing, cs.dash_time + dt, -1.0))
    dash_t = jnp.where(dash_t >= DASH_COOLDOWN, -1.0, dash_t)
    dash_t = jnp.where((state == CS_IDLE) & ~start, -1.0, dash_t)
    speed_mult = jnp.where((dash_t >= 0.0) & (dash_t < DASH_DURATION),
                           DASH_MULT, 1.0)
    v_move = (newx * (motion[0] * mc) + newz * (motion[2] * mc)) \
        * cp.lin_speed * speed_mult

    # velocity: jump sets it, motion overwrites it, otherwise it persists
    # (C only writes ch->velocity in character_jump and the motion branch)
    v_ground = jnp.where(do_jump, v_jump,
                         jnp.where(has_motion, v_move, velocity))
    # movement only applies while moving (character_apply_velocity is only
    # called from the CS_MOVING transition, character.c:352-354)
    delta_g = jnp.where(has_motion & ~do_jump, v_move * dt, jnp.zeros(3))

    # --- TWO shared sweeps cover all three movement modes (grounded /
    # rising / falling) — the per-mode parameters are mask-selected so
    # only two narrowphase passes are traced:
    #   A: grounded full delta | rising combined delta | falling vertical
    #   B: falling horizontal (zero-length otherwise → early-outs)
    v_delta = jnp.array([0.0, 1.0, 0.0]) * (vel_air[1] * dt)
    h_delta = jnp.array([vel_air[0] * dt, 0.0, vel_air[2] * dt])
    delta_a = jnp.where(airborne,
                        jnp.where(rising, vel_air * dt, v_delta), delta_g)
    min_ny_a = jnp.where(falling, 0.5, -1.0)
    stop_a = ~falling
    p_a, frac_a, hit_a = _sweep_delta(world, params, body_pos, idx, delta_a,
                                      min_ny_a, stop_a)
    bp2 = body_pos.at[idx].set(p_a)
    delta_b = jnp.where(falling, h_delta, jnp.zeros(3))
    p_b, _, hit_b = _sweep_delta(world, params, bp2, idx, delta_b, -1.0, True)
    push_body = jnp.where(hit_a >= 0, hit_a, hit_b)

    new_pos = jnp.where(falling, p_b, p_a)
    # vertical velocity cancels when the primary sweep hit (rising
    # combined sweep or falling vertical sweep, character.c:269-301)
    v_air_out = jnp.where(frac_a < 1.0, vel_air.at[1].set(0.0), vel_air)
    new_vel = jnp.where(airborne, v_air_out, v_ground)

    # --- state machine (simplified transition table)
    new_state = state
    new_state = jnp.where(airborne & (state != CS_JUMP_START) & (state != CS_JUMPING),
                          CS_FALLING, new_state)
    new_state = jnp.where(~airborne & has_motion & (state != CS_JUMP_START),
                          CS_MOVING, new_state)
    new_state = jnp.where(~airborne & ~has_motion & ~do_jump
                          & (state != CS_JUMP_START) & (state != CS_JUMPING),
                          CS_IDLE, new_state)
    # landing from fall/jump
    landed = ~airborne & ((state == CS_FALLING) | (state == CS_JUMPING))
    new_state = jnp.where(landed & has_motion, CS_MOVING,
                          jnp.where(landed, CS_IDLE, new_state))
    new_state = jnp.where(do_jump, CS_JUMP_START, new_state)
    jcnt = jnp.where(do_jump, JUMP_START_FRAMES,
                     jnp.where(in_jump_start, jcnt, 0))
    # wake from START on any input (C routes this through the
    # start_to_idle animation, character.c:319-326)
    new_state = jnp.where((state == CS_START) & (has_motion | jump_input),
                          CS_IDLE, new_state)

    # --- history push (grounded only, character.c:546-557)
    push = ~airborne
    hist = jnp.where(
        push,
        cs.history.at[cs.hist_head].set(new_pos),
        cs.history,
    )
    head = jnp.where(push, (cs.hist_head + 1) % POS_HISTORY_MAX, cs.hist_head)
    wrapped = cs.hist_wrapped | (push & (head == 0))

    new_cs = CharState(
        velocity=new_vel.astype(jnp.float32),
        normal=gnormal.astype(jnp.float32),
        state=new_state.astype(jnp.int32),
        airborne=airborne,
        jump=jnp.array(False),  # cleared every frame (character_motion_reset)
        moved=cs.moved + 1,
        jump_start_cnt=jcnt.astype(jnp.int32),
        collision=collision.astype(jnp.int32),
        push_body=push_body.astype(jnp.int32),
        history=hist,
        hist_head=head.astype(jnp.int32),
        hist_wrapped=wrapped,
        dash_time=dash_t.astype(jnp.float32),
    )
    return new_pos, new_cs


def limbo_rescue(cs: CharState, pos, limbo_height):
    """character_update's limbo teleport (character.c:546-599): when the
    character has fallen ``limbo_height`` below its newest grounded
    position, teleport to the oldest recorded grounded position."""
    newest = jnp.where(
        cs.hist_head > 0, cs.history[cs.hist_head - 1],
        jnp.where(cs.hist_wrapped, cs.history[POS_HISTORY_MAX - 1],
                  jnp.zeros(3)),
    )
    have = jnp.sum(newest * newest) > 0
    fell = have & (jnp.abs(pos[1] - newest[1]) >= limbo_height)
    oldest = jnp.where(cs.hist_wrapped, cs.history[cs.hist_head], cs.history[0])
    new_pos = jnp.where(fell, oldest, pos)
    new_cs = cs._replace(
        hist_head=jnp.where(fell, 0, cs.hist_head).astype(jnp.int32),
        hist_wrapped=cs.hist_wrapped & ~fell,
    )
    return new_pos, new_cs, fell
