"""Input fuzzer / replay (reference: core/input-fuzzer.c:17-91).

The reference injects randomized synthetic ``message_input`` records
every frame once toggled (fuzzer_input_step, clap.c:578) as its soak
test. Here the fuzzer is a pure function of (key, frame) → Inputs, so a
seeded stream is deterministic and replayable by construction — the
soak test and the input-replay system are the same thing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .step import Inputs


def fuzz_inputs(key, frame, n_chars: int = 1,
                jump_prob: float = 0.02,
                turn_scale: float = 1.0) -> Inputs:
    """Deterministic per-frame random inputs.

    Mirrors the distribution shape of input-fuzzer.c: a wandering motion
    direction, occasional jumps, slow camera drift."""
    k = jax.random.fold_in(key, frame)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    ang = jax.random.uniform(k1, (n_chars,), minval=0.0, maxval=2 * jnp.pi)
    mag = jax.random.uniform(k2, (n_chars,), minval=0.0, maxval=1.0)
    motion = jnp.stack([jnp.cos(ang) * mag, jnp.sin(ang) * mag], axis=-1)
    jump = jax.random.uniform(k3, (n_chars,)) < jump_prob
    cam = jax.random.normal(k4, (3,)) * jnp.array([0.01, 0.03, 0.05]) * turn_scale
    return Inputs(motion=motion.astype(jnp.float32), jump=jump,
                  cam_delta=cam.astype(jnp.float32))


def fuzz_batch(key, frame, n_envs: int, n_chars: int = 1) -> Inputs:
    """Per-env independent streams (vmapped fold_in over env ids)."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_envs))
    return jax.vmap(lambda kk: fuzz_inputs(kk, frame, n_chars))(keys)
