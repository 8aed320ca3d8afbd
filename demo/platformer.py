#!/usr/bin/env python
"""Platformer demo — the ldjam57 "Towards the Light" analogue
(demo/ldjam57/main.c): switches toggle platform groups, character roster
switching, game-over heights — driven by the data-table game rules
(clap_tpu.engine.gamelogic) and the composed ``game_step`` instead of C
callbacks (switch_connect/disconnect main.c:96-138, character_obj_next
main.c:140-151).

The scripted run walks character 0 onto the terrain switch (revealing
platform group 0), cycles control to character 1 mid-run (the camera
retargets, scene_control_next scene.c:23-55) and keeps walking.

Usage: python demo/platformer.py [--frames N]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    args = ap.parse_args()

    from clap_tpu.engine.game import GameSessionState, GameWorld, game_step
    from clap_tpu.engine.gamelogic import game_config_empty, game_state_init
    from clap_tpu.engine.step import inputs_zero
    from clap_tpu.scene.testbed import build_testbed

    E = 32
    tb = build_testbed(seed=9, side=48.0, nr_v=64, n_dynamic=4,
                       max_entities=E, n_chars=2)

    # gameplay tables: standing on the terrain (entity 0) latches a
    # permanent switch revealing platform group 0 (entities 10, 11)
    gcfg = game_config_empty(2, E)
    gcfg = gcfg._replace(
        switch_entity=jnp.array([0, -1], jnp.int32),
        switch_valid=jnp.array([True, False]),
        switch_group=jnp.array([0, 0], jnp.int32),
        switch_permanent=jnp.array([True, False]),
        platform_group=gcfg.platform_group.at[10].set(0).at[11].set(0),
        platform_on_pos=gcfg.platform_on_pos.at[10].set(
            jnp.array([4.0, 2.0, 0.0])).at[11].set(jnp.array([8.0, 4.0, 0.0])),
        connect_radius=jnp.float32(5.0),
    )
    gw = GameWorld(scene=tb.cfg, game=gcfg)
    gs = GameSessionState(engine=tb.state0, game=game_state_init(2, 2))

    step = jax.jit(lambda s, i, nxt: game_step(gw, s, i, next_character=nxt))
    walk = inputs_zero(2)._replace(
        motion=jnp.zeros((2, 2), jnp.float32).at[0, 0].set(1.0))
    walk2 = inputs_zero(2)._replace(
        motion=jnp.zeros((2, 2), jnp.float32).at[1, 0].set(1.0))

    switch_frame = args.frames // 2
    for f in range(args.frames):
        nxt = jnp.array(f == switch_frame)           # Tab at mid-run
        ins = walk if f <= switch_frame else walk2   # drive controlled char
        gs = step(gs, ins, nxt)
        if f == switch_frame:
            print(f"frame {f}: control -> char", int(gs.game.control),
                  "| connected:", np.asarray(gs.game.connected).tolist())

    st = gs.engine
    print("frames:", args.frames)
    print("char 0:", np.asarray(st.phys.pos[0]).round(2),
          "| char 1:", np.asarray(st.phys.pos[1]).round(2))
    print("camera eye:", np.asarray(st.camera.pos).round(2),
          "(orbits char", int(gs.game.control), ")")
    print("switch on:", bool(gs.game.switch_on[0]),
          "| platform 10 visible:", bool(st.visible[10]),
          "| game over:", bool(gs.game.game_over))


if __name__ == "__main__":
    main()
