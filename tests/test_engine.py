"""End-to-end headless slice: single env, batched envs, sharded envs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu.engine.step import Inputs, engine_step, inputs_zero
from clap_tpu.scene.testbed import build_testbed, replicate_state
from clap_tpu.parallel.sharding import env_mesh, shard_envs


def small_testbed():
    return build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=4,
                         max_entities=32)


@pytest.mark.slow
def test_single_env_steps():
    tb = small_testbed()
    step = jax.jit(lambda s, i: engine_step(tb.cfg, s, i))
    st = tb.state0
    ins = inputs_zero(1)
    walk = ins._replace(motion=ins.motion.at[0, 0].set(1.0))
    for f in range(120):
        st = step(st, walk)
    # character walked somewhere and stayed near the terrain surface
    cpos = np.asarray(st.phys.pos[0])
    assert abs(cpos[0]) > 0.5 or abs(cpos[2]) > 0.5
    assert -5 < cpos[1] < 10
    # dynamic bodies fell onto the terrain (not through it)
    from clap_tpu.scene.terrain import terrain_height_np

    for b in range(1, 5):
        p = np.asarray(st.phys.pos[b])
        h = float(terrain_height_np(tb.terrain, p[0], p[2]))
        assert p[1] > h - 0.5, (b, p, h)
    # entity sync: character entity under its body
    assert np.allclose(np.asarray(st.pos[1]),
                       cpos - np.array([0, float(tb.cfg.bodies.yoffset[0]), 0]),
                       atol=1e-5)
    # world matrix carries the position
    assert np.allclose(np.asarray(st.mx[1][:3, 3]), np.asarray(st.pos[1]), atol=1e-6)
    assert int(st.frame) == 120


@pytest.mark.slow
def test_batched_envs_diverge():
    tb = small_testbed()
    n = 8
    sts = replicate_state(tb.state0, n)
    # different motion per env
    motions = jnp.stack([
        jnp.array([[np.cos(k), np.sin(k)]], jnp.float32) for k in range(n)
    ])
    ins = Inputs(motion=motions, jump=jnp.zeros((n, 1), bool),
                 cam_delta=jnp.zeros((n, 3), jnp.float32))
    step = jax.jit(jax.vmap(lambda s, i: engine_step(tb.cfg, s, i)))
    for _ in range(60):
        sts = step(sts, ins)
    pos = np.asarray(sts.phys.pos[:, 0])
    # envs walked in different directions
    spread = pos.std(axis=0)
    assert spread[0] > 0.3 and spread[2] > 0.3


@pytest.mark.slow
def test_sharded_envs():
    tb = small_testbed()
    mesh = env_mesh()
    n = mesh.devices.size * 2
    sts = replicate_state(tb.state0, n)
    sts = shard_envs(sts, mesh)
    ins = inputs_zero(1)
    ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (n, *x.shape)), ins)
    ins = shard_envs(ins, mesh)
    step = jax.jit(jax.vmap(lambda s, i: engine_step(tb.cfg, s, i)))
    sts2 = step(sts, ins)
    assert int(sts2.frame[0]) == 1
    # all envs identical under identical inputs
    p = np.asarray(sts2.phys.pos)
    assert np.allclose(p, p[0:1], atol=1e-6)


def test_determinism():
    tb = small_testbed()
    step = jax.jit(lambda s, i: engine_step(tb.cfg, s, i))
    ins = inputs_zero(1)._replace(jump=jnp.array([True]))
    s1, s2 = tb.state0, tb.state0
    for _ in range(30):
        s1 = step(s1, ins)
        s2 = step(s2, ins)
    assert np.array_equal(np.asarray(s1.phys.pos), np.asarray(s2.phys.pos))
