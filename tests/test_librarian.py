"""Librarian resolution + asset pack tests."""
from pathlib import Path

from clap_tpu.utils.librarian import RES, Librarian, make_pack


def test_resolve_and_fetch(tmp_path, monkeypatch):
    base = tmp_path / "game"
    (base / "asset").mkdir(parents=True)
    (base / "config").mkdir()
    (base / "asset" / "scene.json").write_bytes(b'{"name": "x"}')
    (base / "config" / "keys.json").write_bytes(b"{}")
    lib = Librarian(base=base)
    assert lib.fetch(RES.ASSET, "scene.json") == b'{"name": "x"}'
    assert lib.fetch(RES.CONFIG, "keys.json") == b"{}"
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "st"))
    p = lib.resolve(RES.STATE, "settings.json")
    assert "clap_tpu" in str(p)


def test_pack_priority(tmp_path):
    base = tmp_path / "game"
    (base / "asset").mkdir(parents=True)
    (base / "asset" / "a.txt").write_bytes(b"disk")
    pak = tmp_path / "builtin.pak"
    make_pack(pak, {"asset/a.txt": b"pack", "asset/b.txt": b"only-pack"})
    lib = Librarian(base=base)
    n = lib.add_pack(pak)
    assert n == 2
    # pack wins over disk (librarian.c:113 builtin-first)
    assert lib.fetch(RES.ASSET, "a.txt") == b"pack"
    assert lib.fetch(RES.ASSET, "b.txt") == b"only-pack"


def test_lib_request_callback(tmp_path):
    base = tmp_path
    (base / "asset").mkdir()
    (base / "asset" / "x").write_bytes(b"data")
    lib = Librarian(base=base)
    got = []
    h = lib.lib_request(RES.ASSET, "x", lambda hh: got.append(hh.state))
    assert got == ["loaded"] and h.data == b"data"
    h2 = lib.lib_request(RES.ASSET, "missing", lambda hh: got.append(hh.state))
    assert got[-1] == "error" and h2.data is None
