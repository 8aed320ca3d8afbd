#!/usr/bin/env python
"""Attribute the headless engine_step cost at 4096 envs (VERDICT r3 #3:
find the 7.6% regression).

Method: time the full vmapped step, then variants with one subsystem
neutralised by monkeypatching its contact/producer function to return
constants — XLA then constant-folds the consumer branch away (masks
become literal False), so the delta measures that subsystem's real cost
inside the fused program (more honest than timing phases in isolation,
which breaks fusion).
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clap_tpu.engine import step as S
from clap_tpu.physics import world as W
from clap_tpu.scene.testbed import build_testbed, replicate_state

N_ENVS = int(os.environ.get("N_ENVS", "4096"))
FRAMES = int(os.environ.get("FRAMES", "30"))


def timeit(label, step, st, ins):
    st1 = step(st, ins)
    jax.block_until_ready(st1)
    t0 = time.perf_counter()
    s = st
    for _ in range(FRAMES):
        s = step(s, ins)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"{label:42s} {dt*1e3:8.3f} ms/frame  "
          f"({N_ENVS/dt:,.0f} env-steps/s)", flush=True)
    return dt


def main():
    tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                       max_entities=64)
    ins1 = S.inputs_zero(1)._replace(
        motion=jnp.array([[1.0, 0.0]], jnp.float32))
    st = replicate_state(tb.state0, N_ENVS)
    ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (N_ENVS, *x.shape)),
                       ins1)

    def make(label):
        return jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i)))

    base = timeit("full step", make("full"), st, ins)

    # --- no pair contacts at all (depth = -inf const → pair solve DCE'd)
    orig_pair = W._pair_contacts

    def no_pairs(params, pos, quat=None):
        n = pos.shape[0]
        p = n * (n - 1) // 2
        return (jnp.full((p,), -jnp.inf),
                jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (p, 3)),
                jnp.zeros((p, 3)))

    W._pair_contacts = no_pairs
    d = timeit("  - pair contacts (gen+solve)", make("nopair"), st, ins)
    W._pair_contacts = orig_pair
    print(f"    pair subsystem cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- no static contacts (heightfield gen + K-slot solve DCE'd)
    orig_static = W._static_contacts

    def no_static(world, params, pos, quat=None, patches=None):
        n = pos.shape[0]
        k = 5 + world.tris.shape[0]
        return (jnp.full((n, k), -jnp.inf),
                jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, k, 3)),
                jnp.zeros((n, k, 3)))

    W._static_contacts = no_static
    d = timeit("  - static contacts (gen+solve)", make("nostatic"), st, ins)
    W._static_contacts = orig_static
    print(f"    static subsystem cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- physics entirely identity
    orig_phys = W.phys_step
    W.phys_step = lambda world, params, state, dt, max_substeps=5: state
    d = timeit("  - phys_step entirely", make("nophys"), st, ins)
    W.phys_step = orig_phys
    print(f"    phys_step cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- characters (controller sweep)
    orig_chars = S._characters_move
    S._characters_move = lambda cfg, st, inputs, dt: st
    d = timeit("  - characters_move", make("nochar"), st, ins)
    S._characters_move = orig_chars
    print(f"    characters_move cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- char push
    orig_push = S._apply_char_push
    S._apply_char_push = lambda cfg, st, dt: st
    d = timeit("  - apply_char_push", make("nopush"), st, ins)
    S._apply_char_push = orig_push
    print(f"    char_push cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- scene_update (one-hot entity<-body + TRS)
    orig_su = S._scene_update
    S._scene_update = lambda cfg, st: st
    d = timeit("  - scene_update", make("noscene"), st, ins)
    S._scene_update = orig_su
    print(f"    scene_update cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- limbo
    orig_limbo = S._limbo
    S._limbo = lambda cfg, st: st
    d = timeit("  - limbo", make("nolimbo"), st, ins)
    S._limbo = orig_limbo
    print(f"    limbo cost: {(base-d)*1e3:+.3f} ms", flush=True)

    # --- pair FRICTION only (keep normal impulses): zero mu
    cfg2 = tb.cfg._replace(bodies=tb.cfg.bodies._replace(
        mu=jnp.zeros_like(tb.cfg.bodies.mu)))
    step2 = jax.jit(jax.vmap(lambda s, i: S.engine_step(cfg2, s, i)))
    d = timeit("  - mu=0 (no friction anywhere)", step2, st, ins)
    print(f"    friction cost (static+pair): {(base-d)*1e3:+.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
