"""Ogg/vorbis codec (ctypes libvorbis binding, sound.c's stb_vorbis
role) and the WebSocket telemetry leg (networking.c:301-470)."""
import time

import numpy as np
import pytest

from clap_tpu.utils import websocket as ws
from clap_tpu.utils.ogg import available as ogg_available
from clap_tpu.utils.telemetry import TelemetryServer, WsTelemetryClient

needs_ogg = pytest.mark.skipif(not ogg_available(),
                               reason="libvorbis not present")


@needs_ogg
def test_ogg_roundtrip_tone():
    from clap_tpu.utils.ogg import decode_ogg_bytes, encode_ogg

    t = np.linspace(0, 1.0, 44100, endpoint=False)
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.3 * np.sin(2 * np.pi * 660 * t)
    stereo = np.stack([left, right], -1).astype(np.float32)
    data = encode_ogg(stereo, 44100, quality=0.4)
    assert data[:4] == b"OggS"
    pcm, rate = decode_ogg_bytes(data)
    assert rate == 44100 and pcm.shape[1] == 2
    # lossy codec: length within a codec-block, dominant freq preserved
    assert abs(pcm.shape[0] - 44100) < 8192
    for ch, f_expect in ((0, 440.0), (1, 660.0)):
        spec = np.abs(np.fft.rfft(pcm[:, ch]))
        f = spec.argmax() * rate / len(pcm)
        assert abs(f - f_expect) < 5.0, (ch, f)


@needs_ogg
def test_load_ogg_through_sound_layer():
    from clap_tpu.utils.ogg import encode_ogg
    from clap_tpu.utils.sound import SoundEngine, load_ogg

    t = np.linspace(0, 0.25, 11025, endpoint=False)
    mono = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    data = encode_ogg(mono, 44100, quality=0.2)
    decoded = load_ogg(data)
    assert decoded.ndim == 1 and decoded.size > 8192
    eng = SoundEngine()
    sid = eng.add_sound(decoded)
    eng.play(sid)
    out = eng.mix(1024)
    assert np.abs(out).max() > 0.01


def test_ws_handshake_and_framing():
    req, expect = ws.handshake_request("h", 1)
    resp = ws.handshake_response(req)
    assert resp is not None and b"101" in resp
    assert ws.parse_http_headers(resp)["sec-websocket-accept"] == expect
    # masked + unmasked frames round-trip, including 126+ length path
    for payload in (b"hi", b"x" * 500):
        for mask in (False, True):
            frames, rest = ws.decode_frames(
                ws.encode_frame(payload, mask=mask))
            assert rest == b"" and frames == [(ws.OP_TEXT, payload)]
    # partial frame: nothing decoded until the rest arrives
    f = ws.encode_frame(b"hello", mask=True)
    msgs, rest = ws.decode_frames(f[:3])
    assert msgs == [] and rest == f[:3]
    msgs, _ = ws.decode_frames(f)
    assert msgs[0][1] == b"hello"


def test_ws_telemetry_end_to_end():
    """WS client logs to the collector and receives the restart
    broadcast — the browser leg of networking.c, same JSON payloads."""
    received = []
    srv = TelemetryServer(port=0, ws_port=0,
                          on_message=lambda m, a: received.append(m))
    try:
        cli = WsTelemetryClient(port=srv.ws_port)
        assert cli.connected
        cli.log("msg", "hello over ws")
        deadline = time.time() + 3.0
        while not received and time.time() < deadline:
            time.sleep(0.02)
        assert received and received[0]["msg"] == "hello over ws"

        cmds = []
        cli.on_command = lambda m: cmds.append(m)
        deadline = time.time() + 3.0
        while not srv.ws_clients and time.time() < deadline:
            time.sleep(0.02)
        srv.broadcast_restart()
        while not cmds and time.time() < deadline:
            cli.poll()
            time.sleep(0.02)
        assert cmds and cmds[0]["command"] == "restart"
        cli.close()
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# effect chains (sound.c:302-630: Schroeder reverb + feedback delay)
# ---------------------------------------------------------------------------

def test_delay_effect_echoes_impulse():
    from clap_tpu.utils.sound import DelayEffect

    rate = 8000
    d = DelayEffect(delay_ms=100.0, feedback=0.5, wet_dry=0.5, rate=rate)
    x = np.zeros(2400, np.float32)
    x[0] = 1.0
    y = d.process(x)
    ds = int(0.1 * rate)                      # 800 samples
    # dry copy at t=0, first echo at ds scaled by wet, second echo
    # at 2·ds scaled by wet·feedback (ring feedback, sound.c:558-580)
    assert abs(y[0] - 0.5) < 1e-6
    assert abs(y[ds] - 0.5) < 1e-6
    assert abs(y[2 * ds] - 0.25) < 1e-6
    # nothing between the taps
    assert np.abs(y[1:ds]).max() < 1e-6


def test_delay_stereo_per_channel():
    from clap_tpu.utils.sound import DelayEffect

    rate = 8000
    d = DelayEffect(delay_ms=[50.0, 100.0], feedback=0.0, wet_dry=1.0,
                    rate=rate, channels=2)
    x = np.zeros((1700, 2), np.float32)
    x[0] = 1.0
    y = d.process(x)
    assert abs(y[400, 0] - 1.0) < 1e-6       # left echo at 50 ms
    assert abs(y[800, 1] - 1.0) < 1e-6       # right echo at 100 ms
    assert abs(y[400, 1]) < 1e-6 and abs(y[800, 0]) < 1e-6


def test_reverb_tail_decays():
    from clap_tpu.utils.sound import ReverbEffect

    rv = ReverbEffect("small_room", room_size=0.25, damping=0.2,
                      wet_dry=1.0)
    x = np.zeros(3600, np.float32)
    x[0] = 1.0
    y = rv.process(x)
    # a reverb tail exists after the direct sound...
    assert np.abs(y[300:1200]).max() > 1e-4
    # ...and decays (feedback 0.84 < 1): late window quieter than early
    early = float(np.abs(y[300:1500]).max())
    late = float(np.abs(y[2400:3600]).max())
    assert late < early
    # dry-only config is a passthrough
    rv0 = ReverbEffect("small_room", room_size=0.25, wet_dry=0.0)
    y0 = rv0.process(x[:600])
    np.testing.assert_allclose(y0, x[:600], atol=1e-7)


def test_engine_per_sound_chain():
    from clap_tpu.utils.sound import DelayEffect, SoundEngine

    eng = SoundEngine(rate=8000)
    imp = np.zeros(16, np.float32)
    imp[0] = 1.0
    s = eng.add_sound(imp)
    eng.set_effect_chain(s, [DelayEffect(delay_ms=25.0, feedback=0.0,
                                         wet_dry=0.5, rate=8000)])
    eng.play(s)
    out = eng.mix(400)
    assert abs(out[0] - 0.5) < 1e-6           # dry at t=0
    assert abs(out[200] - 0.5) < 1e-6         # echo at 25 ms (200 samples)
