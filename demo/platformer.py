#!/usr/bin/env python
"""Platformer demo — the ldjam57 "Towards the Light" analogue
(demo/ldjam57/main.c): switches toggle platform groups, character roster
switching, game-over heights — driven by the data-table game rules
(clap_tpu.engine.gamelogic) instead of C callbacks.

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

    from clap_tpu.engine.gamelogic import (game_config_empty, game_state_init,
                                           game_update)
    from clap_tpu.engine.step import engine_step, inputs_zero
    from clap_tpu.scene.testbed import build_testbed

    tb = build_testbed(seed=9, side=48.0, nr_v=64, n_dynamic=4,
                       max_entities=32)
    E = 32

    # wire gameplay: entity 2 (first dynamic crate) acts as a switch that
    # reveals platform group 0 (entities 10, 11)
    gcfg = game_config_empty(2, E)
    gcfg = gcfg._replace(
        switch_entity=jnp.array([2, -1], jnp.int32),
        switch_valid=jnp.array([True, False]),
        switch_group=jnp.array([0, 0], jnp.int32),
        switch_permanent=jnp.array([False, False]),
        platform_group=gcfg.platform_group.at[10].set(0).at[11].set(0),
        platform_on_pos=gcfg.platform_on_pos.at[10].set(
            jnp.array([4.0, 2.0, 0.0])).at[11].set(jnp.array([8.0, 4.0, 0.0])),
    )
    gs = game_state_init(2, 1)

    step = jax.jit(lambda s, i: engine_step(tb.cfg, s, i))
    gstep = jax.jit(game_update)
    st = tb.state0
    ins = inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))

    for f in range(args.frames):
        st = step(st, ins)
        # ground entity: resolve the character's standing body → entity
        grounded = ~st.chars.airborne[0]
        ground_ent = jnp.where(grounded, 0, -1)  # terrain entity is slot 0
        char_pos = st.pos[1][None]  # character entity slot 1
        gs, vis_override, pos_override = gstep(
            gcfg, gs, ground_ent.astype(jnp.int32), char_pos,
            st.pos[1, 1], jnp.array(False))
        # apply platform overrides to engine state
        is_plat = np.asarray(gcfg.platform_group >= 0)
        st = st._replace(
            visible=jnp.where(jnp.asarray(is_plat), vis_override, st.visible),
            pos=jnp.where(jnp.asarray(is_plat)[:, None], pos_override, st.pos),
        )

    print("frames:", args.frames)
    print("character:", np.asarray(st.phys.pos[0]).round(2))
    print("switch on:", bool(gs.switch_on[0]),
          "| platform 10 visible:", bool(st.visible[10]),
          "| game over:", bool(gs.game_over))


if __name__ == "__main__":
    main()
