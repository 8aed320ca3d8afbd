"""Canvas ops (blit/fill/blend across formats — the reference's
test.c:906-1279 coverage) + debug UI registry."""
import numpy as np
import jax.numpy as jnp

from clap_tpu.ops.canvas import canvas_blend, canvas_blit, canvas_fill, convert
from clap_tpu.render.debugui import DebugUI


def test_convert_roundtrip():
    u8 = jnp.asarray(np.arange(0, 256, 5, dtype=np.uint8).reshape(-1, 1))
    f32 = convert(u8, jnp.float32)
    assert float(f32.max()) <= 1.0
    back = convert(f32, jnp.uint8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u8))
    f16 = convert(u8, jnp.float16)
    assert f16.dtype == jnp.float16


def test_fill_formats():
    for dt in (jnp.uint8, jnp.float16, jnp.float32):
        img = jnp.zeros((4, 4, 4), dt)
        out = canvas_fill(img, (1.0, 0.5, 0.25, 1.0))
        if dt == jnp.uint8:
            assert int(out[0, 0, 0]) == 255 and int(out[0, 0, 1]) == 128
        else:
            assert abs(float(out[0, 0, 1]) - 0.5) < 1e-3


def test_blit_clip_and_convert():
    dst = jnp.zeros((8, 8, 4), jnp.uint8)
    src = jnp.full((4, 4, 4), 0.5, jnp.float32)
    out = canvas_blit(dst, src, 6, 6)  # clipped to 2x2
    a = np.asarray(out)
    assert a[7, 7, 0] == 128
    assert a[5, 5, 0] == 0
    # fully off-canvas → unchanged
    out2 = canvas_blit(dst, src, 20, 20)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(dst))


def test_blend():
    dst = canvas_fill(jnp.zeros((4, 4, 4), jnp.float32), (1, 0, 0, 1.0))
    src = canvas_fill(jnp.zeros((4, 4, 4), jnp.float32), (0, 0, 1, 0.5))
    out = np.asarray(canvas_blend(dst, src, 0, 0))
    assert abs(out[0, 0, 0] - 0.5) < 1e-6   # red halved
    assert abs(out[0, 0, 2] - 0.5) < 1e-6   # blue in
    assert abs(out[0, 0, 3] - 1.0) < 1e-6   # alpha saturated


def test_debugui_registry(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path))
    from clap_tpu.utils.settings import Settings

    s = Settings("dbg.json")
    dui = DebugUI(settings=s)
    dui.register("fps", lambda: {"fps": 59.9})
    dui.register("mem", lambda: {"objs": 12})
    assert not dui.modules["fps"].enabled
    dui.toggle("fps")
    els = dui.build_elements()
    texts = [e.text for e in els]
    assert "FPS" in texts and "fps: 59.9" in texts
    assert not any("objs" in t for t in texts)
    # persisted: a fresh registry restores enable state
    s2 = Settings("dbg.json")
    dui2 = DebugUI(settings=s2)
    dui2.register("fps", lambda: {})
    assert dui2.modules["fps"].enabled
