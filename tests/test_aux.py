"""Aux subsystems: profiler, checkpoint, fuzzer, settings, bus, telemetry."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clap_tpu.utils.profiler import Profiler
from clap_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from clap_tpu.utils.settings import Settings
from clap_tpu.utils.bus import MT, Message, MessageBus
from clap_tpu.utils.telemetry import TelemetryClient, TelemetryServer
from clap_tpu.engine.fuzzer import fuzz_inputs, fuzz_batch


def test_profiler_segments():
    p = Profiler()
    for _ in range(3):
        p.frame_begin()
        time.sleep(0.001)
        p.step("move")
        time.sleep(0.002)
        p.step("phys")
        p.frame_end()
    r = p.report()
    assert r["fps"] > 0
    assert r["phys_ms"] >= r["move_ms"] * 0.5
    assert set(r) == {"fps", "move_ms", "phys_ms"}


def test_checkpoint_roundtrip(tmp_path):
    from clap_tpu.engine.state import engine_state_init

    st = engine_state_init(8, 4, 1)
    st = st._replace(pos=st.pos.at[2].set(jnp.array([1.0, 2.0, 3.0])),
                     frame=jnp.int32(77))
    path = save_checkpoint(str(tmp_path / "ckpt"), st)
    st2 = load_checkpoint(path, st)
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(st.pos))
    assert int(st2.frame) == 77


def test_fuzzer_deterministic():
    key = jax.random.PRNGKey(5)
    a = fuzz_inputs(key, jnp.int32(10))
    b = fuzz_inputs(key, jnp.int32(10))
    c = fuzz_inputs(key, jnp.int32(11))
    np.testing.assert_array_equal(np.asarray(a.motion), np.asarray(b.motion))
    assert not np.array_equal(np.asarray(a.motion), np.asarray(c.motion))
    batch = fuzz_batch(key, jnp.int32(0), 4)
    assert batch.motion.shape == (4, 1, 2)
    # envs get different streams
    m = np.asarray(batch.motion)
    assert np.std(m[:, 0, 0]) > 0


def test_settings_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path))
    s = Settings("t.json")
    s.set("window.width", 1280)
    s.set("sound.volume", 0.5)
    s2 = Settings("t.json")
    assert s2.get("window.width") == 1280
    assert s2.get("sound.volume") == 0.5
    assert s2.get("missing.key", 42) == 42


def test_messagebus():
    bus = MessageBus()
    got = []
    bus.subscribe(MT.COMMAND, lambda m: got.append(m.data) or 0)
    n = bus.send(Message(MT.COMMAND, data={"cmd": "restart"}))
    assert n == 1 and got == [{"cmd": "restart"}]
    assert bus.send(Message(MT.LOG, data={})) == 0


def test_telemetry_roundtrip():
    received = []
    srv = TelemetryServer(port=0, on_message=lambda m, a: received.append(m))
    cli = TelemetryClient(port=srv.port)
    assert cli.connected
    cli.log("info", "hello")
    cli.status(fps=60)
    deadline = time.time() + 3
    while len(received) < 2 and time.time() < deadline:
        time.sleep(0.05)
    assert len(received) >= 2
    assert received[0]["type"] == "log" and received[0]["msg"] == "hello"

    commands = []
    cli.on_command = lambda m: commands.append(m)
    srv.broadcast_restart()
    deadline = time.time() + 3
    while not commands and time.time() < deadline:
        cli.poll()
        time.sleep(0.05)
    assert commands and commands[0]["command"] == "restart"
    cli.close()
    srv.close()


def test_finite_guards_quarantine():
    """Numeric guards (SURVEY §5.2 sanitizer analogue): one corrupt env
    in a batch resets to the reference state; healthy envs untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clap_tpu.utils.guards import assert_finite, finite_mask, quarantine

    tree = {"a": jnp.arange(12.0).reshape(4, 3),
            "b": jnp.ones((4,), jnp.int32)}
    bad = {"a": tree["a"].at[2, 1].set(jnp.nan), "b": tree["b"]}
    ok = np.asarray(finite_mask(bad))
    assert list(ok) == [True, True, False, True]
    ref = {"a": jnp.zeros((4, 3)), "b": jnp.zeros((4,), jnp.int32)}
    fixed, ok2 = quarantine(bad, ref)
    np.testing.assert_allclose(np.asarray(fixed["a"][2]), 0.0)
    np.testing.assert_allclose(np.asarray(fixed["a"][0]),
                               np.asarray(tree["a"][0]))
    assert int(fixed["b"][2]) == 0 and int(fixed["b"][0]) == 1

    try:
        assert_finite(bad)
        raised = False
    except FloatingPointError:
        raised = True
    assert raised


@pytest.mark.slow
def test_engine_nan_watchdog_resets():
    """Engine's 1 Hz watchdog resets a corrupted state (or aborts with
    -E, the abort_on_error CLI of clap.c:909-915)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from clap_tpu.engine.core import ClapConfig, Engine
    from clap_tpu.scene.testbed import build_testbed

    tb = build_testbed(seed=3, side=16.0, nr_v=17, n_dynamic=1,
                       max_entities=8)
    eng = Engine(ClapConfig(title="t"), tb.cfg, tb.state0)
    eng.frame_no = 58
    eng.state = eng.state._replace(
        phys=eng.state.phys._replace(
            pos=eng.state.phys.pos.at[0, 1].set(jnp.nan)))
    eng.frame()  # frame 59: no check
    eng.frame()  # frame 60: watchdog fires → reset
    assert np.isfinite(np.asarray(eng.state.phys.pos)).all()

    eng2 = Engine(ClapConfig(title="t", abort_on_error=True), tb.cfg,
                  tb.state0)
    eng2.frame_no = 59
    eng2.state = eng2.state._replace(
        phys=eng2.state.phys._replace(
            pos=eng2.state.phys.pos.at[0, 1].set(jnp.nan)))
    with pytest.raises(FloatingPointError):
        eng2.frame()


def test_logger_levels_ring_and_abort():
    """Leveled logger + ring sink + abort_on_error (logger.h:19-60,
    clap.c:909-915)."""
    import pytest

    from clap_tpu.utils.logger import (DBG, ERR, NORMAL, Logger, RingSink,
                                       WARN)

    log = Logger(level=NORMAL, stdio=False)
    ring = RingSink(capacity=3, level=NORMAL)
    log.add_sink(ring)
    log.dbg("below level")            # filtered by logger level
    log.msg("one")
    log.warn("two")
    log.err("three")
    log.msg("four")                   # ring capacity 3 → "one" evicted
    got = ring.drain()
    assert [e.msg for e in got] == ["two", "three", "four"]
    assert [e.level for e in got] == [WARN, ERR, NORMAL]
    assert ring.drain() == []

    log2 = Logger(abort_on_error=True, stdio=False)
    with pytest.raises(RuntimeError):
        log2.err("boom")
    log2.warn("fine")                 # only ERR aborts
