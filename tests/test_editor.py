"""In-engine scene editor (scene.c:174-304 live entity edits +
scene_save re-serialization, scene.c:1891-1922): input-driven edits
mutate the EngineState functionally and the edited scene round-trips
through save → load_scene."""
import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "demo"))

import assets57
from clap_tpu.engine.input import InputRecord, apply_key
from clap_tpu.scene.editor import MODES, SceneEditor, edit_entity
from clap_tpu.scene.loader import load_scene

LEVEL = (Path(__file__).resolve().parents[1] / "demo" / "level57.json")


def _load():
    return load_scene(LEVEL.read_text(), asset_loader=assets57.asset_loader,
                      max_entities=16, max_bodies=4)


def test_edit_entity_rebuilds_matrix():
    scene = _load()
    st = scene.state0
    st2 = edit_entity(st, 2, pos=[1.0, 2.0, 3.0], scale=2.0)
    np.testing.assert_allclose(np.asarray(st2.pos[2]), [1.0, 2.0, 3.0])
    # world matrix rebuilt: translation column + scaled basis
    m = np.asarray(st2.mx[2])
    np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
    assert abs(np.linalg.norm(m[:3, 0]) - 2.0) < 1e-5
    # other slots untouched
    np.testing.assert_array_equal(np.asarray(st2.pos[0]),
                                  np.asarray(st.pos[0]))


def test_editor_input_routing():
    scene = _load()
    ed = SceneEditor(scene)
    st = scene.state0

    # inactive: records pass through
    st, consumed = ed.handle_input(InputRecord(right=True), st)
    assert not consumed

    # F1 toggles the editor on (KEY_BINDINGS routes f1 → edit_toggle)
    rec = apply_key(InputRecord(), "f1", True)
    assert rec.edit_toggle
    st, consumed = ed.handle_input(rec, st)
    assert consumed and ed.active

    # tab cycles selection
    st, _ = ed.handle_input(InputRecord(tab=True), st)
    assert ed.sel == 1

    # move mode: right nudges +x by step
    x0 = float(st.pos[1, 0])
    st, consumed = ed.handle_input(InputRecord(right=True), st)
    assert consumed
    assert abs(float(st.pos[1, 0]) - (x0 + ed.step)) < 1e-6

    # enter cycles mode; rotate turns about Y
    st, _ = ed.handle_input(InputRecord(enter=True), st)
    assert ed.mode == "rotate"
    q0 = np.asarray(st.rot[1])
    st, _ = ed.handle_input(InputRecord(right=True), st)
    assert not np.allclose(np.asarray(st.rot[1]), q0)

    # scale mode
    st, _ = ed.handle_input(InputRecord(enter=True), st)
    s0 = float(st.scale[1])
    st, _ = ed.handle_input(InputRecord(right=True), st)
    assert float(st.scale[1]) > s0

    # visibility mode: space toggles
    st, _ = ed.handle_input(InputRecord(enter=True), st)
    v0 = bool(st.visible[1])
    st, _ = ed.handle_input(InputRecord(space=True), st)
    assert bool(st.visible[1]) != v0

    assert ed.status()["edited"] >= 1
    assert [ed.mode] == [MODES[ed.mode_idx]]


@pytest.mark.slow
def test_editor_through_engine():
    """Wired, not an island: Engine.attach_editor routes records into
    the live state and the next frame steps the edited world."""
    from clap_tpu.engine.core import ClapConfig, Engine
    from clap_tpu.scene.testbed import build_testbed

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    scene = _load()     # editor session over the loaded level's DOM
    eng = Engine(ClapConfig(title="t"), tb.cfg, tb.state0)
    ed = eng.attach_editor(scene)
    assert eng.route_editor(InputRecord(edit_toggle=True))
    ed.sel = 3
    x0 = float(eng.state.pos[3, 0])
    assert eng.route_editor(InputRecord(right=True))
    assert abs(float(eng.state.pos[3, 0]) - (x0 + ed.step)) < 1e-6
    eng.frame()          # edited state steps fine
    assert eng.frame_no == 1


def test_editor_save_roundtrip():
    scene = _load()
    ed = SceneEditor(scene)
    ed.active = True
    ed.sel = 2
    st = scene.state0
    st = ed.nudge(st, 1.5, 0.0, -0.5)
    st = ed.rotate_yaw(st, np.pi / 6)
    st = ed.rescale(st, 1.25)

    saved = ed.save(st)
    scene2 = load_scene(saved, asset_loader=assets57.asset_loader,
                        max_entities=16, max_bodies=4)
    np.testing.assert_allclose(np.asarray(scene2.state0.pos[2]),
                               np.asarray(st.pos[2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene2.state0.rot[2]),
                               np.asarray(st.rot[2]), atol=1e-6)
    assert abs(float(scene2.state0.scale[2]) - float(st.scale[2])) < 1e-6
    # untouched entities round-trip unchanged
    np.testing.assert_allclose(np.asarray(scene2.state0.pos[3]),
                               np.asarray(scene.state0.pos[3]), atol=1e-6)
