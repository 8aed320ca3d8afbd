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
