"""scene.json loader tests with a synthetic scene + glTF assets."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu.scene.loader import load_scene, save_scene
from clap_tpu.engine.step import engine_step, inputs_zero
from test_gltf import make_skinned_gltf


SCENE = {
    "name": "test_scene",
    "limbo_height": 33.0,
    "model": [
        {
            "name": "hero",
            "gltf": "hero.gltf",
            "physics": {"geom": "capsule", "mass": 70.0},
            "character": [
                {"name": "hero1", "position": [1, 0, 2], "speed": 1.5}
            ],
        },
        {
            "name": "crate",
            "gltf": "hero.gltf",
            "physics": {"geom": "sphere", "mass": 2.0, "bounce": 0.4,
                        "radius": 0.5},
            "entity": [
                {"position": [3, 5, 0]},
                {"position": [-3, 5, 0], "scale": 2.0},
            ],
        },
        {
            "name": "deco",
            "gltf": "hero.gltf",
            "entity": [
                {"name": "rider", "position": [0, 1, 0],
                 "attach": "hero1"}
            ],
        },
    ],
    "light": [
        {"direction": [-0.5, -1, -0.3], "color": [1, 0.9, 0.8]},
        {"position": [0, 3, 0], "color": [0.2, 0.2, 1.0],
         "attenuation": [1, 0.1, 0.05]},
    ],
}


def _loader(name):
    return make_skinned_gltf().encode()


def test_load_scene_structure():
    sc = load_scene(json.dumps(SCENE), asset_loader=_loader)
    assert sc.name == "test_scene"
    assert float(sc.cfg.limbo_height) == 33.0
    assert len(sc.models) == 3
    # entities: hero1, 2 crates, rider
    active = np.asarray(sc.cfg.entities.active)
    assert active[:4].all() and not active[4:].any()
    # character got a kinematic capsule body
    assert bool(sc.cfg.bodies.kinematic[0])
    assert int(sc.cfg.char_params.body[0]) == 0
    # crates are dynamic spheres with bounce
    assert abs(float(sc.cfg.bodies.bounce[1]) - 0.4) < 1e-6
    # attach resolved
    assert int(sc.cfg.entities.parent[3]) == 0
    # lights
    assert bool(sc.lights.is_dir[0]) and not bool(sc.lights.is_dir[1])
    assert bool(sc.lights.active[1])
    # rig was built for the skinned model
    assert sc.models[0].rig is not None


@pytest.mark.slow
def test_loaded_scene_steps():
    sc = load_scene(json.dumps(SCENE), asset_loader=_loader)
    step = jax.jit(lambda s, i: engine_step(sc.cfg, s, i))
    st = sc.state0
    ins = inputs_zero(1)
    for _ in range(30):
        st = step(st, ins)
    # crates fell toward the flat ground plane
    assert float(st.phys.pos[1, 1]) < 5.0
    assert np.isfinite(np.asarray(st.pos)).all()


def test_scene_save_roundtrip():
    sc = load_scene(json.dumps(SCENE), asset_loader=_loader)
    out = save_scene(sc)
    doc = json.loads(out)
    assert doc["name"] == "test_scene"
    assert doc["model"][0]["character"][0]["position"] == [1.0, 0.0, 2.0]
    # reload the saved doc
    sc2 = load_scene(out, asset_loader=_loader)
    assert len(sc2.entity_names) == len(sc.entity_names)
