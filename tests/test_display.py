"""Browser display server: HTTP page, WS upgrade, frame streaming and
the input return channel (display-www.c + input-www.c analogue)."""
import json
import socket
import time

import numpy as np

from clap_tpu.render.display import DisplayServer
from clap_tpu.utils import websocket as ws
from clap_tpu.utils.png import decode_png


def _recv_until(sock, pred, timeout=5.0):
    buf = b""
    sock.settimeout(timeout)
    end = time.monotonic() + timeout
    while time.monotonic() < end:
        try:
            data = sock.recv(65536)
        except socket.timeout:
            break
        if not data:
            break
        buf += data
        if pred(buf):
            break
    return buf


def test_http_serves_index():
    d = DisplayServer(port=0)
    try:
        s = socket.create_connection((d.host, d.port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        buf = _recv_until(s, lambda b: b"</html>" in b)
        assert b"200 OK" in buf
        assert b"canvas" in buf
        s.close()
    finally:
        d.close()


def test_ws_frame_stream_and_input_roundtrip():
    d = DisplayServer(port=0, max_fps=0)   # no throttle
    try:
        s = socket.create_connection((d.host, d.port), timeout=5)
        req, accept = ws.handshake_request(d.host, d.port, "/ws")
        s.sendall(req)
        buf = _recv_until(s, lambda b: b"\r\n\r\n" in b)
        assert b"101" in buf
        assert accept.encode() in buf
        # wait for the server to register the client
        for _ in range(50):
            if d.n_clients:
                break
            time.sleep(0.05)
        assert d.n_clients == 1

        # engine → browser: push a frame, decode the PNG on the client
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :, 0] = 1.0
        assert d.push_frame(img)
        raw = _recv_until(s, lambda b: len(ws.decode_frames(b)[0]) > 0)
        msgs, _ = ws.decode_frames(raw)
        assert msgs and msgs[0][0] == ws.OP_BIN
        decoded = decode_png(msgs[0][1])
        assert decoded.shape[:2] == (8, 8)
        assert decoded[0, 0, 0] == 255 and decoded[0, 0, 1] == 0

        # browser → engine: key events fold into the InputRecord
        for key, down in (("w", True), ("space", True), ("space", False)):
            s.sendall(ws.encode_frame(
                json.dumps({"t": "key", "key": key, "down": down}).encode(),
                ws.OP_TEXT, mask=True))   # clients must mask
        evs = []
        for _ in range(100):
            evs += d.poll_events()
            if len(evs) >= 3:
                break
            time.sleep(0.05)
        assert len(evs) == 3
        assert d.record.up is True       # w held
        assert d.record.space is False   # pressed then released
        s.close()
    finally:
        d.close()


def test_record_to_inputs_from_display_record():
    # the display's InputRecord drives the same binding path as the
    # keyboard (record_to_inputs), dash included — stable treedef
    import jax

    from clap_tpu.engine.input import InputRecord, record_to_inputs
    from clap_tpu.engine.step import inputs_zero

    rec = InputRecord(up=True, shift=True)
    ins = record_to_inputs(rec, 0.0, n_chars=2)
    z = inputs_zero(2)
    assert jax.tree.structure(ins) == jax.tree.structure(z)
    assert bool(ins.dash[0]) is True
    assert float(np.linalg.norm(np.asarray(ins.motion[0]))) > 0.5
