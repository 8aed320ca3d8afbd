"""UI layout/composite, font, primitives, engine orchestrator tests."""
import numpy as np
import jax.numpy as jnp

from clap_tpu.render.font import render_text, text_size, glyph_bitmap
from clap_tpu.render.ui import AF, UiElement, ui_compose, ui_layout, osd
from clap_tpu.scene import primitives as prim
from clap_tpu.engine.core import ClapConfig, Engine, parse_cli


def test_font_renders():
    bm = render_text("FPS 60", scale=1)
    assert bm.shape[0] == 7
    assert bm.sum() > 10
    # unknown char falls back to '?'
    np.testing.assert_array_equal(glyph_bitmap("~"), glyph_bitmap("?"))
    h, w = text_size("AB", 2)
    assert h == 14 and w == 22


def test_ui_layout_affinity():
    els = [
        UiElement(w=0.5, h=0.25, affinity=AF.RIGHT | AF.BOTTOM, x=10, y=10),
        UiElement(w=100, h=50, affinity=AF.CENTER | AF.VCENTER),
    ]
    quads = ui_layout(els, 800, 600)
    q0, q1 = quads
    assert q0.x1 == 800 - 10 and q0.y1 == 600 - 10
    assert q0.x0 == 800 - 10 - 400
    assert q1.x0 == 350 and q1.y0 == 275


def test_ui_children_relative():
    parent = UiElement(w=200, h=100, affinity=AF.LEFT | AF.TOP,
                       children=[UiElement(w=0.5, h=0.5,
                                           affinity=AF.RIGHT | AF.BOTTOM)])
    quads = ui_layout([parent], 800, 600)
    child = quads[1]
    assert child.x1 == 200 and child.y1 == 100
    assert child.x0 == 100 and child.y0 == 50


def test_ui_compose():
    frame = jnp.zeros((64, 128, 3))
    quads = ui_layout([UiElement(w=20, h=10, color=(1, 0, 0, 0.5)),
                       osd("HI", text_scale=1)], 128, 64)
    out = np.asarray(ui_compose(frame, quads))
    assert out[5, 5, 0] > 0.4 and out[5, 5, 1] == 0  # red quad blended
    assert out.max() <= 1.0
    assert (out > 0).sum() > 100  # text pixels lit


def test_primitives():
    for builder, nv in ((prim.quad, 4), (prim.cube, 24)):
        v, n, uv, f = builder()
        assert v.shape[0] == nv
        assert np.abs(np.linalg.norm(n, axis=-1) - 1).max() < 1e-5
        assert f.max() < len(v)
    v, n, uv, f = prim.cylinder(segments=8)
    assert f.max() < len(v)
    v, n, uv, f = prim.frame_quad()
    assert len(f) == 8


def test_engine_runs_frames():
    from clap_tpu.scene.testbed import build_testbed

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    eng = Engine(ClapConfig(fuzzer=True), tb.cfg, tb.state0, argv=[])
    eng.run(max_frames=10)
    assert eng.frame_no == 10
    rep = eng.profiler.report()
    assert rep["fps"] > 0 and "sim_ms" in rep


def test_engine_timers_and_commands():
    from clap_tpu.scene.testbed import build_testbed
    from clap_tpu.utils.bus import MT, Message

    tb = build_testbed(seed=7, side=32.0, nr_v=32, n_dynamic=2,
                       max_entities=16)
    eng = Engine(ClapConfig(), tb.cfg, tb.state0, argv=["-e", "1", "-E"])
    assert eng.cfg.exit_after == 1 and eng.cfg.abort_on_error
    fired = []
    eng.timer_set(0.0, lambda e: fired.append(e.frame_no))
    eng.frame()
    assert fired == [0]
    eng.bus.send(Message(MT.COMMAND, data={"cmd": "exit"}))
    eng.run(max_frames=100)
    assert eng.frame_no <= 2  # stopped immediately


def test_ui_animations():
    from clap_tpu.render.ui_anim import UiAnimator, UiAnimation, EASINGS

    el = UiElement(w=100, h=40, y=-50.0, color=(1, 1, 1, 0.0))
    an = UiAnimator()
    an.slide_in(el, -50.0, 20.0, duration=0.5)
    an.fade(el, 0.0, 0.8, duration=0.25)
    for _ in range(35):   # a little past the longest duration
        an.step(1 / 60)
    assert abs(el.y - 20.0) < 1e-6
    assert abs(el.color[3] - 0.8) < 1e-6
    assert not an.anims  # all finished and removed
    # easings hit endpoints
    for name, fn in EASINGS.items():
        assert abs(fn(0.0)) < 1e-9 and abs(fn(1.0) - 1.0) < 1e-6
