#!/usr/bin/env python
"""Platformer demo — the ldjam57 "Towards the Light" analogue
(demo/ldjam57/main.c), driven by the AUTHORED DATA LEVEL
demo/level57.json: switches, platform groups, characters, cameras, and
lights all load from scene.json gameplay blocks (switch_connect/
disconnect main.c:96-138 as data, character roster main.c:140-245) —
no scripted game wiring in code.

The scripted run walks the controlled character onto raised switch box
A (its own collision trimesh — the ground-entity hook character.c:
490-496), revealing platform group 0, crosses the now-solid platforms,
latches switch B for group 1, cycles control to character 1 mid-run
(the camera retargets, scene_control_next scene.c:23-55), and reports
whether anyone reached the light.

Usage: python demo/platformer.py [--frames N] [--level path.json]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--level",
                    default=str(Path(__file__).parent / "level57.json"))
    args = ap.parse_args()

    import assets57
    from clap_tpu.anim.system import (anim_instances_init,
                                      anim_sfx_from_names,
                                      default_state_map)
    from clap_tpu.engine.game import GameSessionState, GameWorld, game_step
    from clap_tpu.engine.gamelogic import game_state_init
    from clap_tpu.engine.step import inputs_zero
    from clap_tpu.scene.loader import load_scene
    from clap_tpu.scene.testbed import build_demo_rig

    scene = load_scene(Path(args.level).read_text(),
                       asset_loader=assets57.asset_loader,
                       max_entities=16, max_bodies=4)
    assert scene.game is not None, "level declares no gameplay blocks"
    n_chars = scene.cfg.char_params.body.shape[0]
    K = scene.game.switch_entity.shape[0]

    # character rigs + frame-SFX: the CS_MOVING clip fires alternating
    # footsteps at its contact frames (motion_frame_sfx scene.c:1239-1303)
    sk, lib, acfg = build_demo_rig()
    sfx = anim_sfx_from_names(["idle", "motion", "jump", "fall"],
                              motion_segments=4)
    gw = GameWorld(scene=scene.cfg, game=scene.game, anim=acfg,
                   anim_sk=sk, anim_lib=lib, sfx=sfx)
    gs = GameSessionState(
        engine=scene.state0, game=game_state_init(K, n_chars),
        anim=anim_instances_init(n_chars, with_sfx=True),
        joint_mats=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                            (n_chars, 3, 1, 1)),
        sfx_events=jnp.zeros((n_chars, 2), bool))

    step = jax.jit(lambda s, i, nxt: game_step(gw, s, i, next_character=nxt))
    walk = {c: inputs_zero(n_chars)._replace(
        motion=jnp.zeros((n_chars, 2), jnp.float32).at[c, 0].set(1.0))
        for c in range(n_chars)}

    # sound: footstep voices from the animation frame hooks, mixed one
    # 60 Hz slice per frame into the demo's output WAV
    from clap_tpu.utils.sound import SoundEngine, save_wav, synth_tone

    snd = SoundEngine()
    foot_ids = (snd.add_sound(synth_tone(95.0, 0.09) * 0.8),
                snd.add_sound(synth_tone(110.0, 0.09) * 0.8))
    audio = []
    footsteps = []                 # (frame, foot, char) voice log

    switch_frame = args.frames * 2 // 3
    events = []
    seen = set()
    for f in range(args.frames):
        nxt = jnp.array(f == switch_frame)          # Tab at 2/3 mark
        ctrl = int(gs.game.control)
        gs = step(gs, walk[ctrl], nxt)
        ev = np.asarray(gs.sfx_events)
        for c in range(n_chars):
            for foot in range(2):
                if ev[c, foot]:
                    snd.play(foot_ids[foot])
                    footsteps.append((f, foot, c))
        audio.append(snd.mix(snd.rate // 60))
        if f == switch_frame:
            events.append((f, f"control -> char {int(gs.game.control)} "
                           f"(connected {np.asarray(gs.game.connected).tolist()})"))
        for k in range(K):
            if bool(gs.game.switch_on[k]) and k not in seen:
                seen.add(k)
                events.append((f, f"switch {k} ON -> platforms visible: "
                               f"{int(np.asarray(gs.engine.visible).sum())}"))

    st = gs.engine
    for f, msg in events:
        print(f"frame {f}: {msg}")
    names = scene.entity_names
    goal_x = 25.0
    reached = [c for c in range(n_chars)
               if float(st.phys.pos[scene.cfg.char_params.body[c], 0])
               > goal_x - 2.0]
    print("frames:", args.frames)
    for c in range(n_chars):
        p = np.asarray(st.phys.pos[scene.cfg.char_params.body[c]])
        print(f"char {c}: {p.round(2)}")
    print("switches on:", np.asarray(gs.game.switch_on).tolist())
    print("platforms visible:",
          [names[i] for i in range(len(names))
           if int(scene.game.platform_group[i]) >= 0 and bool(st.visible[i])])
    print("camera eye:", np.asarray(st.camera.pos).round(2),
          "(orbits char", int(gs.game.control), ")")
    if audio:
        wav = np.concatenate(audio)
        out = Path(__file__).parent / "out"
        out.mkdir(exist_ok=True)
        save_wav(str(out / "platformer_audio.wav"), wav)
        print(f"footsteps: {len(footsteps)} "
              f"(first 5: {footsteps[:5]}) -> {out/'platformer_audio.wav'}"
              f" rms={float(np.sqrt(np.mean(wav**2))):.4f}")
    print("reached the light:", reached if reached else "no one (yet)")


if __name__ == "__main__":
    main()
