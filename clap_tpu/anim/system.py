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


def anim_instance_init() -> AnimInstance:
    return AnimInstance(queue=queue_init(), prev_state=jnp.int32(-1))


def anim_instances_init(n: int) -> AnimInstance:
    """Batched instances for n rigs (mq_update animates every entity's
    rig each frame, model.c:1953 — game_step vmaps over this batch)."""
    import jax

    one = anim_instance_init()
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n, *x.shape)), one)


def anim_step(acfg: AnimConfig, sk: Skeleton, lib: AnimLibrary,
              inst: AnimInstance, char_state, dt):
    """Advance one character's animation.

    On a CS_* transition, the mapped clip replaces the queue (the C
    clears + pushes transition/loop clips); the queue then advances by
    dt, and the current clip's pose is sampled and turned into skinning
    matrices. Returns (new AnimInstance, joint matrices (J,4,4))."""
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
    return AnimInstance(queue=q, prev_state=jnp.asarray(char_state, jnp.int32)), jt
