#!/usr/bin/env python
"""Compare env-axis-first vs env-axis-last vmap layouts for the sim step."""
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
from clap_tpu.scene.testbed import build_testbed

N = 4096
tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8, max_entities=64)
ins1 = S.inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.3f} ms  ({N/dt:,.0f} env-steps/s)")
    return out


# env-first (current)
st_f = jax.tree.map(lambda x: jnp.broadcast_to(x, (N, *x.shape)) + 0 * jnp.zeros((), x.dtype) if x.dtype != bool else jnp.broadcast_to(x, (N, *x.shape)), tb.state0)
st_f = jax.tree.map(lambda x: jnp.array(x), st_f)
ins_f = jax.tree.map(lambda x: jnp.broadcast_to(x, (N, *x.shape)), ins1)
step_f = jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i)))
timeit("env-first vmap", step_f, st_f, ins_f)

# env-first + donation
step_fd = jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i)),
                  donate_argnums=0)
st2 = jax.tree.map(lambda x: jnp.array(x), st_f)
out = step_fd(st2, ins_f)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(30):
    out = step_fd(out, ins_f)
jax.block_until_ready(out)
print(f"{'env-first + donate':34s} {(time.perf_counter()-t0)/30*1e3:8.3f} ms")

# env-last
st_l = jax.tree.map(lambda x: jnp.broadcast_to(x[..., None], (*x.shape, N)), tb.state0)
st_l = jax.tree.map(lambda x: jnp.array(x), st_l)
ins_l = jax.tree.map(lambda x: jnp.broadcast_to(x[..., None], (*x.shape, N)), ins1)
step_l = jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i),
                          in_axes=-1, out_axes=-1))
timeit("env-last vmap", step_l, st_l, ins_l)

# env-last + donation
step_ld = jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i),
                           in_axes=-1, out_axes=-1), donate_argnums=0)
st3 = jax.tree.map(lambda x: jnp.array(x), st_l)
out = step_ld(st3, ins_l)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(30):
    out = step_ld(out, ins_l)
jax.block_until_ready(out)
print(f"{'env-last + donate':34s} {(time.perf_counter()-t0)/30*1e3:8.3f} ms")
