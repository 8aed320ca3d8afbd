"""Animation system: state-driven clip switching inside a jitted loop,
and end-to-end with the character controller + skinning."""
import numpy as np
import jax
import jax.numpy as jnp

from clap_tpu.anim.clips import PATH_ROTATION, PATH_TRANSLATION, build_library
from clap_tpu.anim.skin import skin_verts
from clap_tpu.anim.system import (AnimConfig, anim_instance_init, anim_step,
                                  default_state_map)
from clap_tpu.char import controller as C
from test_anim import make_rig


def make_lib():
    idle = [(1, PATH_TRANSLATION, [0.0, 1.0], [[0, 1, 0], [0, 1, 0]])]
    walk = [(1, PATH_TRANSLATION, [0.0, 1.0], [[0, 1, 0], [1, 1, 0]])]
    jump = [(2, PATH_TRANSLATION, [0.0, 0.5], [[0, 1, 0], [0, 2, 0]])]
    lib = build_library([idle, walk, jump], 3)
    names = ["idle", "motion", "jump"]
    return lib, names


def test_state_map():
    _, names = make_lib()
    acfg = default_state_map(names)
    assert int(acfg.state_clip[C.CS_IDLE]) == 0
    assert int(acfg.state_clip[C.CS_MOVING]) == 1
    assert int(acfg.state_clip[C.CS_JUMPING]) == 2
    assert bool(acfg.state_repeat[C.CS_MOVING])
    assert not bool(acfg.state_repeat[C.CS_JUMP_START])


def test_transitions_drive_clips():
    sk = make_rig()
    lib, names = make_lib()
    acfg = default_state_map(names)
    inst = anim_instance_init()
    step = jax.jit(lambda i, s: anim_step(acfg, sk, lib, i, s, jnp.float32(0.1)))

    inst, jt = step(inst, jnp.int32(C.CS_IDLE))
    assert int(inst.queue.clip[0]) == 0
    # idle pose: joint 1 global at y=1 (base translation, no motion)
    np.testing.assert_allclose(np.asarray(jt[1][:3, 3]), [0, 1, 0], atol=1e-5)

    # switch to MOVING: clip 1, time resets; advance 0.5s → x lerps to 0.5
    for _ in range(5):
        inst, jt = step(inst, jnp.int32(C.CS_MOVING))
    assert int(inst.queue.clip[0]) == 1
    x = float(jt[1][0, 3])
    assert 0.3 < x < 0.6

    # staying in MOVING does NOT reset the queue
    t_before = float(inst.queue.time)
    inst, jt = step(inst, jnp.int32(C.CS_MOVING))
    assert float(inst.queue.time) > t_before or float(inst.queue.time) < 0.2


def test_looping_wraps():
    sk = make_rig()
    lib, names = make_lib()
    acfg = default_state_map(names)
    inst = anim_instance_init()
    step = jax.jit(lambda i, s: anim_step(acfg, sk, lib, i, s, jnp.float32(0.3)))
    for _ in range(10):  # 3s through a 1s looping clip
        inst, jt = step(inst, jnp.int32(C.CS_MOVING))
    assert int(inst.queue.clip[0]) == 1
    assert 0.0 <= float(inst.queue.time) < 1.0


def test_skinned_character_end_to_end():
    """Controller state → anim system → skinning: a walking character's
    mesh deforms."""
    sk = make_rig()
    lib, names = make_lib()
    acfg = default_state_map(names)
    inst = anim_instance_init()
    verts = jnp.array([[0.0, 1.0, 0.0], [0.0, 2.0, 0.0]])
    w = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    ji = jnp.array([[1, 0, 0, 0], [2, 0, 0, 0]], jnp.int32)

    inst, jt = anim_step(acfg, sk, lib, inst, jnp.int32(C.CS_MOVING),
                         jnp.float32(0.5))
    sv, _ = skin_verts(jt, verts, verts, w, ji)
    # joint 1 moved +x by ~0.5 → vertex followed
    assert float(sv[0, 0]) > 0.3
