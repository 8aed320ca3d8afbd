"""Soak test: fuzzer-driven batched envs over many frames (the CI role
of the reference's input fuzzer + --exitafter headless runs, SURVEY §4).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu.engine.fuzzer import fuzz_batch
from clap_tpu.engine.step import engine_step
from clap_tpu.scene.testbed import build_testbed, replicate_state


@pytest.mark.slow
def test_fuzzed_batched_soak():
    tb = build_testbed(seed=13, side=32.0, nr_v=32, n_dynamic=4,
                       max_entities=32)
    n = 8
    sts = replicate_state(tb.state0, n)
    step = jax.jit(jax.vmap(lambda s, i: engine_step(tb.cfg, s, i)))
    key = jax.random.PRNGKey(99)
    for f in range(200):
        ins = fuzz_batch(key, jnp.int32(f), n)
        sts = step(sts, ins)
    pos = np.asarray(sts.phys.pos)
    assert np.isfinite(pos).all()
    assert np.isfinite(np.asarray(sts.mx)).all()
    # characters stayed within the world (limbo rescue bounds falls)
    cy = pos[:, 0, 1]
    assert (cy > -100).all() and (cy < 100).all()
    # envs diverged under different input streams
    assert pos[:, 0, 0].std() > 0.01
    assert int(sts.frame[0]) == 200
