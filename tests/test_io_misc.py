"""Sound, debug draw, input bindings tests."""
import numpy as np
import jax.numpy as jnp

from clap_tpu.utils.sound import (SoundEngine, load_wav, lowpass_fft,
                                  save_wav, synth_tone)
from clap_tpu.render.debug_draw import (add_aabb, add_cross, add_line,
                                        draw_lines, lines_empty)
from clap_tpu.engine.input import (InputRecord, apply_axis, apply_key,
                                   record_to_inputs)
from clap_tpu import mathx as mx


def test_sound_wav_roundtrip(tmp_path):
    tone = synth_tone(440, 0.1)
    p = tmp_path / "t.wav"
    save_wav(p, tone)
    back = load_wav(p)
    assert len(back) == len(tone)
    assert np.abs(back - tone).max() < 1e-3


def test_mixer_gain_loop():
    eng = SoundEngine()
    s = eng.add_sound(np.ones(100, np.float32) * 0.5)
    v = eng.play(s, gain=0.5)
    out = eng.mix(50)
    assert abs(out[0] - 0.25) < 1e-5
    # non-looping voice ends
    eng.mix(100)
    assert not eng.voices[v].playing
    # looping voice keeps playing
    v2 = eng.play(s, loop=True)
    eng.mix(500)
    assert eng.voices[v2].playing


def test_lowpass():
    sig = synth_tone(200, 0.2, envelope=False) + synth_tone(8000, 0.2,
                                                            envelope=False)
    out = lowpass_fft(sig, 1000)
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(out), 1 / 44100)
    hi = spec[freqs > 4000].max()
    lo = spec[(freqs > 150) & (freqs < 300)].max()
    assert lo > hi * 50


def test_debug_draw_overlay():
    frame = jnp.zeros((64, 64, 3))
    dl = lines_empty(64)
    idx = 0
    dl, idx = add_line(dl, idx, [-1, 0, 0], [1, 0, 0], (1, 0, 0))
    dl, idx = add_aabb(dl, idx, [-0.5, -0.5, -0.5], [0.5, 0.5, 0.5])
    dl, idx = add_cross(dl, idx, [0, 0, 0])
    assert idx == 1 + 12 + 3
    view = mx.mat4_look_at(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                           jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 10.0)
    out = np.asarray(draw_lines(frame, dl, view, proj))
    assert (out[:, :, 0] > 0).sum() > 30   # red line pixels
    assert (out[:, :, 1] > 0).sum() > 50   # green box pixels


def test_input_bindings():
    rec = InputRecord()
    rec = apply_key(rec, "w", True)
    rec = apply_key(rec, "d", True)
    rec = apply_key(rec, "space", True)
    rec = apply_axis(rec, "axis2", 0.5)
    ins = record_to_inputs(rec, cam_yaw=0.0, lin_speed=1.0)
    m = np.asarray(ins.motion[0])
    assert abs(np.linalg.norm(m) - 1.0) < 1e-5   # normalized diagonal
    assert m[0] > 0 and m[1] < 0                  # right + forward(-z)
    assert bool(ins.jump[0])
    assert float(ins.cam_delta[1]) > 0            # right-stick yaw
