"""Animation queue (model.c:1406-1592: animation_push/animated_update).

Per-entity queue of clips with repeat/speed and end notification. The C
queue is a linked list with end-callbacks; here it's a fixed Q-slot ring
advanced with masked shifts, and "a clip just ended" is returned as a
flag the character state machine consumes (replacing the callback
pattern — the callbacks in the reference only drive state transitions
and SFX, character.c:316-426).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

QUEUE_MAX = 4


class AnimQueue(NamedTuple):
    clip: jnp.ndarray      # (Q,) int32 clip ids, -1 empty
    repeat: jnp.ndarray    # (Q,) bool: loop at end
    time: jnp.ndarray      # () f32 current clip time
    speed: jnp.ndarray     # () f32 (animation_set_speed, dash ×1.5)


def queue_init() -> AnimQueue:
    return AnimQueue(
        clip=jnp.full((QUEUE_MAX,), -1, jnp.int32),
        repeat=jnp.zeros((QUEUE_MAX,), bool),
        time=jnp.float32(0.0),
        speed=jnp.float32(1.0),
    )


def queue_push(q: AnimQueue, clip_id, repeat, clear: bool | jnp.ndarray):
    """animation_push_by_name: optionally clear the queue, then append.

    With ``clear`` the new clip becomes current (time resets)."""
    clip_id = jnp.asarray(clip_id, jnp.int32)
    cleared = AnimQueue(
        clip=jnp.full_like(q.clip, -1).at[0].set(clip_id),
        repeat=jnp.zeros_like(q.repeat).at[0].set(repeat),
        time=jnp.float32(0.0),
        speed=q.speed,
    )
    # append at first free slot
    free = q.clip < 0
    slot = jnp.argmax(free)          # first empty (undefined if full: drop)
    any_free = jnp.any(free)
    appended = AnimQueue(
        clip=jnp.where(any_free, q.clip.at[slot].set(clip_id), q.clip),
        repeat=jnp.where(any_free, q.repeat.at[slot].set(repeat), q.repeat),
        time=q.time,
        speed=q.speed,
    )
    clear = jnp.asarray(clear)
    return AnimQueue(
        clip=jnp.where(clear, cleared.clip, appended.clip),
        repeat=jnp.where(clear, cleared.repeat, appended.repeat),
        time=jnp.where(clear, cleared.time, appended.time),
        speed=q.speed,
    )


def queue_advance(q: AnimQueue, durations, dt):
    """animated_update: advance time; wrap on repeat, pop on end.

    durations: (L,) clip durations. Returns (new_queue, ended, active):
    ended pulses True the frame a non-repeating clip finishes."""
    cur = q.clip[0]
    has = cur >= 0
    dur = jnp.maximum(durations[jnp.maximum(cur, 0)], 1e-6)
    t = q.time + dt * q.speed
    over = has & (t >= dur)
    rep = q.repeat[0]
    # repeat: wrap (model.c keeps looping clips at frame granularity)
    t_wrapped = jnp.mod(t, dur)
    # pop: shift left
    clip_pop = jnp.concatenate([q.clip[1:], jnp.full((1,), -1, jnp.int32)])
    rep_pop = jnp.concatenate([q.repeat[1:], jnp.zeros((1,), bool)])
    pop = over & ~rep
    new = AnimQueue(
        clip=jnp.where(pop, clip_pop, q.clip),
        repeat=jnp.where(pop, rep_pop, q.repeat),
        time=jnp.where(over, jnp.where(rep, t_wrapped, 0.0), t),
        speed=q.speed,
    )
    return new, pop, has
