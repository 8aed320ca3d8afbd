"""Rotating trimesh collision (VERDICT r3 missing #5): collision
follows the FULL entity transform — a platform rotated 90° about y is
solid where it now lies and phantom where it used to (ODE geoms ride
entity transforms, physics.c:789-811)."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "demo"))
import assets57

from clap_tpu import mathx as mx
from clap_tpu.engine.step import engine_step, inputs_zero
from clap_tpu.scene.loader import load_scene

SCENE = {
    "name": "rot_platform",
    "collision_follows_entities": True,
    "collision_follows_rotation": True,
    "model": [
        {"name": "hero", "gltf": "box:0.6,2.0,0.6",
         "physics": {"geom": "capsule", "mass": 70.0},
         "character": [{"name": "hero1", "position": [2.5, 4.0, 0.0]}]},
        {"name": "beam", "gltf": "box:6.0,0.4,1.0",
         "physics": {"geom": "trimesh"},
         "entity": [{"name": "beam.0", "position": [0, 2.0, 0]}]},
    ],
}


def _loader(name):
    dims = [float(x) for x in name.split(":")[1].split(",")]
    return assets57.make_box_gltf(*dims).encode()


def _scene():
    return load_scene(json.dumps(SCENE), asset_loader=_loader,
                      max_entities=8, max_bodies=2)


def _settle(cfg, st, frames=120):
    step = jax.jit(lambda s, i: engine_step(cfg, s, i))
    ins = inputs_zero(1)
    for _ in range(frames):
        st = step(st, ins)
    return st


def test_rest_rot_loaded():
    scene = _scene()
    assert scene.cfg.ent_rest_pos is not None
    assert scene.cfg.ent_rest_rot is not None


@pytest.mark.slow
def test_unrotated_beam_supports_character():
    scene = _scene()
    st = _settle(scene.cfg, scene.state0)
    b0 = scene.cfg.char_params.body[0]
    foot = float(st.phys.pos[b0, 1]) - float(scene.cfg.bodies.yoffset[b0])
    # beam top = 2.0 + 0.2 (box centered on its origin y)
    assert foot > 2.0, foot


def test_rotated_beam_collision_follows():
    """Rotate the beam 90° about y: the character over x=2.5 loses its
    footing (beam now spans z); a character over z=2.5 is supported."""
    scene = _scene()
    q90 = mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                  jnp.float32(np.pi / 2))
    st = scene.state0._replace(
        rot=scene.state0.rot.at[1].set(q90))      # entity 1 = beam.0
    b0 = scene.cfg.char_params.body[0]

    # char above x=2.5 (old beam direction): falls to the ground
    st_x = _settle(scene.cfg, st)
    foot_x = float(st_x.phys.pos[b0, 1]) \
        - float(scene.cfg.bodies.yoffset[b0])
    assert foot_x < 1.0, (foot_x, "beam no longer under x=2.5")

    # char above z=2.5 (new beam direction): lands on the rotated beam
    st2 = st._replace(phys=st.phys._replace(
        pos=st.phys.pos.at[b0].set(jnp.array([0.0, 4.0, 2.5]))))
    st_z = _settle(scene.cfg, st2)
    foot_z = float(st_z.phys.pos[b0, 1]) \
        - float(scene.cfg.bodies.yoffset[b0])
    assert foot_z > 2.0, (foot_z, "rotated beam supports z=2.5")
    assert int(st_z.chars.collision[0]) == 1      # standing on the beam
