"""Telemetry networking (reference: core/networking.c, 1074 LoC).

The reference's only distributed component is a poll()-based TCP (21044)
+ WebSocket (21045) layer forwarding logs to a collector and accepting
remote-restart commands (SURVEY §2.10/§5.8) — dev tooling, not
simulation traffic. This re-provides that role with a line-delimited
JSON protocol over TCP:

- ``TelemetryClient``: non-blocking log/status forwarding from the
  engine host loop (the logger ring-buffer sink analogue,
  networking.c:98) + restart-command callback.
- ``TelemetryServer``: collector used by tools/server.py
  (tools/server/server.c) with broadcast_restart.

Simulation state never crosses this socket; cross-chip scale-out rides
XLA collectives (parallel/sharding.py).
"""
from __future__ import annotations

import json
import socket
import threading
import time

DEFAULT_PORT = 21044  # networking.c default


class TelemetryClient:
    def __init__(self, host: str = "127.0.0.1", port: int = DEFAULT_PORT,
                 on_command=None, connect_timeout: float = 0.5):
        self.addr = (host, port)
        self.sock = None
        self.on_command = on_command
        self._rx = b""
        try:
            self.sock = socket.create_connection(self.addr, connect_timeout)
            self.sock.setblocking(False)
        except OSError:
            self.sock = None  # degrade silently like the reference client

    @property
    def connected(self) -> bool:
        return self.sock is not None

    def send(self, mtype: str, **payload) -> None:
        if not self.sock:
            return
        try:
            line = json.dumps({"type": mtype, "ts": time.time(), **payload})
            self.sock.sendall(line.encode() + b"\n")
        except OSError:
            self.close()

    def log(self, level: str, msg: str) -> None:
        self.send("log", level=level, msg=msg)

    def status(self, **fields) -> None:
        """1 Hz status broadcast analogue (clap.c:224-258 FPS message)."""
        self.send("status", **fields)

    def poll(self) -> None:
        """networking_poll: drain commands (e.g. restart)."""
        if not self.sock:
            return
        try:
            data = self.sock.recv(65536)
            if not data:
                self.close()
                return
            self._rx += data
        except BlockingIOError:
            return
        except OSError:
            self.close()
            return
        while b"\n" in self._rx:
            line, self._rx = self._rx.split(b"\n", 1)
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            if msg.get("type") == "command" and self.on_command:
                self.on_command(msg)

    def close(self) -> None:
        if self.sock:
            try:
                self.sock.close()
            finally:
                self.sock = None


class TelemetryServer:
    """Log collector + restart broadcaster (tools/server/server.c)."""

    def __init__(self, host: str = "127.0.0.1", port: int = DEFAULT_PORT,
                 on_message=None):
        self.on_message = on_message or (lambda m, a: None)
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen(16)
        self.port = self.listener.getsockname()[1]
        self.clients: list[socket.socket] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import select

        buffers = {}
        while not self._stop.is_set():
            socks = [self.listener] + self.clients
            ready, _, _ = select.select(socks, [], [], 0.2)
            for s in ready:
                if s is self.listener:
                    conn, addr = self.listener.accept()
                    conn.setblocking(False)
                    self.clients.append(conn)
                    buffers[conn] = b""
                    continue
                try:
                    data = s.recv(65536)
                except OSError:
                    data = b""
                if not data:
                    self.clients.remove(s)
                    buffers.pop(s, None)
                    s.close()
                    continue
                buffers[s] += data
                while b"\n" in buffers[s]:
                    line, buffers[s] = buffers[s].split(b"\n", 1)
                    try:
                        self.on_message(json.loads(line), s)
                    except json.JSONDecodeError:
                        pass

    def broadcast_restart(self) -> None:
        """networking_broadcast_restart (networking.c:552)."""
        line = json.dumps({"type": "command", "command": "restart"}).encode() + b"\n"
        for c in list(self.clients):
            try:
                c.sendall(line)
            except OSError:
                pass

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=1)
        for c in self.clients:
            c.close()
        self.listener.close()
