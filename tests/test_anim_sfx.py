"""Animation-frame SFX hooks (VERDICT r3 missing #3): footsteps fire
from the CS_MOVING clip's contact frames (motion_frame_sfx
scene.c:1239-1303) and flow game_step → session sfx_events → SoundEngine
voices."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clap_tpu.anim.system import (AnimSfx, anim_instance_init,
                                  anim_instances_init, anim_sfx_from_names,
                                  anim_step, default_state_map)
from clap_tpu.char.controller import CS_MOVING
from clap_tpu.engine.step import inputs_zero
from clap_tpu.scene.testbed import build_demo_rig


def test_anim_sfx_table_from_names():
    sfx = anim_sfx_from_names(["idle", "motion", "jump_to_motion",
                               "fall"], motion_segments=4)
    assert int(sfx.segments[1]) == 4 and int(sfx.segments[0]) == 0
    assert float(sfx.single[2]) == 0.5 and int(sfx.single_foot[2]) == 1
    assert float(sfx.single[3]) == 0.0 and int(sfx.single_foot[3]) == 0


def test_motion_footsteps_alternate_and_align():
    """Drive the motion clip; footsteps must fire exactly when
    normalized clip time crosses (2k+1)/segments, right foot first,
    alternating, and reset on loop wrap."""
    sk, lib, acfg = build_demo_rig()
    sfx = anim_sfx_from_names(["idle", "motion", "jump", "fall"],
                              motion_segments=4)
    inst = anim_instance_init(with_sfx=True)
    dt = jnp.float32(1.0 / 60.0)

    step = jax.jit(lambda i, s: anim_step(acfg, sk, lib, i, s, dt, sfx=sfx))
    dur = float(lib.duration[1])                    # motion clip
    events = []
    t_at = []
    for f in range(int(3.3 * dur * 60)):            # >3 loops
        inst, _jt, ev = step(inst, jnp.int32(CS_MOVING))
        ev = np.asarray(ev)
        if ev.any():
            events.append(("L" if ev[0] else "R"))
            t_at.append(float(inst.queue.time) / dur)
    # thresholds (2k+1)/4 ∈ {0.25, 0.75}: 2 footsteps per loop
    # (motion_frame_sfx fires nr_segments/2 steps per cycle)
    assert len(events) >= 6, events
    # right first, strictly alternating (incl. across the loop reset)
    assert events[0] == "R"
    assert all(a != b for a, b in zip(events, events[1:]))
    # fire times sit just past the per-loop thresholds 0.25 / 0.75
    for i, t in enumerate(t_at):
        th = 0.25 if i % 2 == 0 else 0.75
        assert th <= t < th + 2.5 * (1 / 60) / dur, (i, t, th)


def test_single_shot_sfx_fires_once():
    sk, lib, acfg = build_demo_rig()
    # treat the fall clip (id 3) as a one-shot left-foot thud at t=0
    sfx = anim_sfx_from_names(["idle", "motion", "jump", "fall"])
    inst = anim_instance_init(with_sfx=True)
    dt = jnp.float32(1.0 / 60.0)
    step = jax.jit(lambda i, s: anim_step(acfg, sk, lib, i, s, dt, sfx=sfx))
    fires = 0
    for f in range(30):
        inst, _jt, ev = step(inst, jnp.int32(6))    # CS_FALLING
        if bool(np.asarray(ev).any()):
            fires += 1
            assert bool(ev[0])                      # left foot
    assert fires == 1


@pytest.mark.slow
def test_game_step_emits_and_engine_plays():
    """sfx_events flow through game_step; Engine.attach_sound turns them
    into SoundEngine voices + a mixed audio buffer (the sfx_play path,
    scene.c:1249-1255)."""
    from test_game_step import build_gameworld
    from clap_tpu.engine.core import ClapConfig, Engine
    from clap_tpu.engine.game import game_step

    gw, gs = build_gameworld()
    n_chars = gw.scene.char_params.body.shape[0]
    sfx = anim_sfx_from_names(["idle", "motion", "jump", "fall"],
                              motion_segments=4)
    gw = gw._replace(sfx=sfx)
    gs = gs._replace(anim=anim_instances_init(n_chars, with_sfx=True),
                     sfx_events=jnp.zeros((n_chars, 2), bool))

    cfg = ClapConfig(title="t", settings=False)
    eng = Engine(cfg, gw.scene, gs.engine, game_world=gw, session0=gs)
    eng.attach_sound()
    walk = inputs_zero(n_chars)._replace(
        motion=jnp.zeros((n_chars, 2), jnp.float32).at[0, 0].set(1.0))
    for _ in range(150):
        eng.frame(walk)
    assert len(eng.voice_log) >= 2, eng.voice_log
    # footstep frames are spaced by the clip's contact cadence (not
    # every frame, not one burst)
    frames = [f for f, _foot, _c in eng.voice_log]
    gaps = np.diff(frames)
    assert (gaps > 2).all(), frames
    wav = np.concatenate(eng.audio_buffer)
    assert wav.shape[0] == 150 * (eng.sound.rate // 60)
    assert float(np.abs(wav).max()) > 0.01          # audible thumps
