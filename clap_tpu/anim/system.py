"""Character animation system: state machine → clip queue → pose →
skinning matrices (the glue the reference spreads across
character_set_state's animation_push_by_name calls, character.c:316-426,
and animated_update, model.c:1406-1592).

The C pushes clips by NAME on state transitions; here a static
state→clip table drives the same transitions as masked queue ops, so the
whole animation path stays inside the jitted step. vmap over characters
and envs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..char import controller as C
from .clips import AnimLibrary, Pose, sample_pose
from .joints import Skeleton, joint_matrices
from .queue import AnimQueue, queue_advance, queue_init, queue_push

N_STATES = 7  # CS_START..CS_FALLING (character.h:11-18)


class AnimConfig(NamedTuple):
    """Static per-character-model animation wiring."""

    state_clip: jnp.ndarray    # (N_STATES,) int32 clip per CS_*, -1 none
    state_repeat: jnp.ndarray  # (N_STATES,) bool looped clip


class AnimInstance(NamedTuple):
    """Dynamic per-character animation state."""

    queue: AnimQueue
    prev_state: jnp.ndarray    # int32 last seen CS_*
    sfx_state: jnp.ndarray = None  # int32 frame-SFX counter (the
                                   # queued_animation->sfx_state of
                                   # scene.c:1239-1293); None when the
                                   # scene wires no animation SFX


class AnimSfx(NamedTuple):
    """Per-clip frame-SFX wiring (the animation_sfx table,
    scene.c:1295-1303, resolved per clip at scene load like
    scene.c:1678-1684).

    segments[c] > 0: the clip fires alternating footsteps every time
    normalized progress crosses (2k+1)/segments (motion_frame_sfx) —
    right foot first.
    single[c] ≥ 0: the clip fires ONE footstep when progress crosses the
    threshold (jump_to_motion at 0.5; motion_stop/fall at 0);
    single_foot[c] picks the foot (0 = left, 1 = right)."""

    segments: jnp.ndarray     # (L,) int32, 0 = none
    single: jnp.ndarray       # (L,) f32 normalized threshold, -1 = none
    single_foot: jnp.ndarray  # (L,) int32 0 left / 1 right


def anim_sfx_from_names(names: list[str], motion_segments: int = 4):
    """Build the per-clip AnimSfx table from clip names — the exact
    name→frame_fn wiring of animation_sfx (scene.c:1295-1303)."""
    import numpy as np

    L = max(len(names), 1)
    seg = np.zeros((L,), np.int32)
    single = np.full((L,), -1.0, np.float32)
    foot = np.zeros((L,), np.int32)
    for i, n in enumerate(names):
        if n == "motion":
            seg[i] = motion_segments
        elif n == "motion_stop":
            single[i], foot[i] = 0.0, 0          # left
        elif n in ("fall_to_idle", "jump_to_idle", "fall"):
            single[i], foot[i] = 0.0, 0          # left
        elif n == "jump_to_motion":
            single[i], foot[i] = 0.5, 1          # right
    return AnimSfx(segments=jnp.asarray(seg), single=jnp.asarray(single),
                   single_foot=jnp.asarray(foot))


def default_state_map(names: list[str]) -> AnimConfig:
    """Map CS_* to clips by the reference's naming convention
    ("idle"/"motion"/"jump"/"fall", scene.c animation renames)."""
    def find(*cands):
        for c in cands:
            if c in names:
                return names.index(c)
        return -1

    idle = find("idle")
    motion = find("motion", "walk", "run")
    jump = find("jump")
    fall = find("fall", "falling")
    table = [idle, idle, idle, motion, jump, jump, fall]  # START..FALLING
    repeat = [True, True, True, True, False, True, True]
    return AnimConfig(
        state_clip=jnp.asarray(table, jnp.int32),
        state_repeat=jnp.asarray(repeat),
    )


def anim_instance_init(with_sfx: bool = False) -> AnimInstance:
    return AnimInstance(queue=queue_init(), prev_state=jnp.int32(-1),
                        sfx_state=jnp.int32(0) if with_sfx else None)


def anim_instances_init(n: int, with_sfx: bool = False) -> AnimInstance:
    """Batched instances for n rigs (mq_update animates every entity's
    rig each frame, model.c:1953 — game_step vmaps over this batch).

    with_sfx allocates the frame-SFX counter — pass True when the
    GameWorld wires an AnimSfx table (the treedef must be stable from
    frame 0)."""
    import jax

    one = anim_instance_init(with_sfx)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n, *x.shape)), one)


def anim_step(acfg: AnimConfig, sk: Skeleton, lib: AnimLibrary,
              inst: AnimInstance, char_state, dt, sfx: AnimSfx = None):
    """Advance one character's animation.

    On a CS_* transition, the mapped clip replaces the queue (the C
    clears + pushes transition/loop clips); the queue then advances by
    dt, and the current clip's pose is sampled and turned into skinning
    matrices. Returns (new AnimInstance, joint matrices (J,4,4)) — plus
    a (2,) bool [left, right] footstep-event vector when ``sfx`` wires
    the per-clip table (the frame_sfx callbacks, scene.c:1239-1303,
    model.c frame hooks)."""
    changed = char_state != inst.prev_state
    clip = acfg.state_clip[jnp.clip(char_state, 0, N_STATES - 1)]
    rep = acfg.state_repeat[jnp.clip(char_state, 0, N_STATES - 1)]
    do_push = changed & (clip >= 0)

    q = queue_push(inst.queue, clip, rep, jnp.array(True))
    q = jax.tree.map(lambda new, old: jnp.where(do_push, new, old),
                     q, inst.queue)
    q, ended, active = queue_advance(q, lib.duration, dt)

    cur = jnp.maximum(q.clip[0], 0)
    pose = sample_pose(lib, sk.base, cur, q.time)
    # no active clip → rest pose
    has = q.clip[0] >= 0
    pose = Pose(
        trans=jnp.where(has, pose.trans, sk.base.trans),
        rot=jnp.where(has, pose.rot, sk.base.rot),
        scale=jnp.where(has, pose.scale, sk.base.scale),
    )
    jt = joint_matrices(sk, pose)

    sfx_state = inst.sfx_state
    events = None
    if sfx is not None:
        # frame-SFX counter: reset on clip replacement or loop wrap
        # (qa->sfx_state starts at 0 per queued clip), then fire when
        # normalized progress crosses the clip's next trigger
        state = jnp.int32(0) if sfx_state is None else sfx_state
        reset = do_push | (q.time < inst.queue.time)
        state = jnp.where(reset, 0, state)
        dur = jnp.maximum(lib.duration[cur], 1e-6)
        tn = q.time / dur
        nseg = sfx.segments[cur]
        thr = (state.astype(jnp.float32) * 2.0 + 1.0) \
            / jnp.maximum(nseg.astype(jnp.float32), 1.0)
        fire_seg = has & (nseg > 0) & (tn >= thr)
        # alternating feet, right first (motion_frame_sfx scene.c:1249)
        right_seg = (state % 2) == 0
        sthr = sfx.single[cur]
        fire_one = has & (sthr >= 0) & (state == 0) & (tn >= sthr)
        right_one = sfx.single_foot[cur] == 1
        fired = fire_seg | fire_one
        right = jnp.where(fire_seg, right_seg, right_one)
        events = jnp.stack([fired & ~right, fired & right])   # (2,) L/R
        sfx_state = state + fired.astype(jnp.int32)

    inst2 = AnimInstance(queue=q,
                         prev_state=jnp.asarray(char_state, jnp.int32),
                         sfx_state=sfx_state)
    if sfx is None:
        return inst2, jt
    return inst2, jt, events
