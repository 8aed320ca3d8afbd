#!/usr/bin/env python
"""Per-phase timing of the headline sim step at 4096 envs (TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from clap_tpu.engine import step as S
from clap_tpu.physics import world as W
from clap_tpu.scene.testbed import build_testbed, replicate_state

N = 4096
tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8, max_entities=64)
ins1 = S.inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))
st = replicate_state(tb.state0, N)
ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (N, *x.shape)), ins1)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return out


full = jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i)))
timeit("engine_step (full)", full, st, ins)

chars = jax.jit(jax.vmap(lambda s, i: S._characters_move(tb.cfg, s, i, jnp.float32(1/60))))
timeit("characters_move", chars, st, ins)

phys = jax.jit(jax.vmap(lambda s: s._replace(phys=W.phys_step(tb.cfg.world, tb.cfg.bodies, s.phys, jnp.float32(1/60), 2))))
timeit("phys_step x2", phys, st)

sub1 = jax.jit(jax.vmap(lambda s: s._replace(phys=W._substep(tb.cfg.world, tb.cfg.bodies, s.phys, jnp.float32(W.FIXED_DT)))))
timeit("one substep", sub1, st)

statc = jax.jit(jax.vmap(lambda s: W._static_contacts(tb.cfg.world, tb.cfg.bodies, s.phys.pos)))
timeit("static contacts (9 bodies)", statc, st)

pairc = jax.jit(jax.vmap(lambda s: W._pair_contacts(tb.cfg.bodies, s.phys.pos)))
timeit("pair contacts (9x9)", pairc, st)

limbo = jax.jit(jax.vmap(lambda s: S._limbo(tb.cfg, s)))
timeit("limbo", limbo, st)

scup = jax.jit(jax.vmap(lambda s: S._scene_update(tb.cfg, s)))
timeit("scene_update", scup, st)

cam = jax.jit(jax.vmap(lambda s, i: S._camera_update(tb.cfg, s, i)))
timeit("camera_update", cam, st, ins)
