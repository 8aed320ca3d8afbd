"""Gameplay rules engine (reference: demo/ldjam57/main.c + the
connect/disconnect hook mechanism, character.c:490-496).

The reference wires C callbacks: stepping on a switch entity "connects"
it (toggling its platform group visible + repositioned), leaving a
non-permanent switch parks its platforms 100 units up and strips
VISIBLE (switch_connect/disconnect, platform_entity_update main.c:82-138).
Character roster switching connects characters by proximity and cycles
through connected ones (main.c:140-245, scene_control_next scene.c:23-55).

Here the callbacks become data: a GameConfig of switch/platform tables
and a pure ``game_update`` applying the same rules as masked array ops
— per env under vmap, so 4096 copies of the game run at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PLATFORM_PARK_Y = 100.0     # main.c:96-138: hidden platforms park +100 up
GAME_OVER_Y = -130.0        # main.c:182-243
CAMERA_SPIN_Y = -450.0


class GameConfig(NamedTuple):
    """Static gameplay wiring, device arrays."""

    # switches (K slots)
    switch_entity: jnp.ndarray     # (K,) int32 entity id of each switch
    switch_permanent: jnp.ndarray  # (K,) bool: stays on once triggered
    switch_group: jnp.ndarray      # (K,) int32 platform group it controls
    switch_valid: jnp.ndarray      # (K,) bool
    # platforms (E entities)
    platform_group: jnp.ndarray    # (E,) int32 group id, -1 = not a platform
    platform_on_pos: jnp.ndarray   # (E, 3) position when active
    # roster
    connect_radius: jnp.ndarray    # () f32 proximity to connect characters


class GameState(NamedTuple):
    switch_on: jnp.ndarray         # (K,) bool
    prev_ground: jnp.ndarray       # () int32 last ground entity id
    control: jnp.ndarray           # () int32 controlled character slot
    connected: jnp.ndarray         # (C,) bool roster connectivity
    game_over: jnp.ndarray         # () bool


def game_config_empty(n_switches: int, n_entities: int) -> GameConfig:
    return GameConfig(
        switch_entity=jnp.zeros((n_switches,), jnp.int32),
        switch_permanent=jnp.zeros((n_switches,), bool),
        switch_group=jnp.zeros((n_switches,), jnp.int32),
        switch_valid=jnp.zeros((n_switches,), bool),
        platform_group=jnp.full((n_entities,), -1, jnp.int32),
        platform_on_pos=jnp.zeros((n_entities, 3), jnp.float32),
        connect_radius=jnp.float32(3.0),
    )


def game_state_init(n_switches: int, n_chars: int) -> GameState:
    return GameState(
        switch_on=jnp.zeros((n_switches,), bool),
        prev_ground=jnp.int32(-1),
        control=jnp.int32(0),
        connected=jnp.zeros((n_chars,), bool).at[0].set(True),
        game_over=jnp.array(False),
    )


def game_update(gcfg: GameConfig, gs: GameState, ground_entity,
                char_positions, char_y, next_input):
    """One gameplay tick.

    ground_entity: int32 entity the controlled character stands on
    (-1 airborne) — the connect/disconnect source (character.c:490-496).
    char_positions: (C, 3) character entity positions (roster proximity).
    char_y: controlled character height (game-over check).
    next_input: bool — cycle to the next connected character (Tab,
    character_obj_next main.c:140-151).

    Returns (new GameState, entity_visible_override, entity_pos_override)
    where the overrides are (E,) bool / (E, 3) arrays the engine applies
    to platform entities.
    """
    changed = ground_entity != gs.prev_ground

    # connect: new ground is a switch → turn on (toggle semantics:
    # switches turn ON on connect; permanent ones latch)
    is_new = gcfg.switch_valid & (gcfg.switch_entity == ground_entity) & changed
    # disconnect: old ground was a non-permanent switch → off
    is_old = gcfg.switch_valid & (gcfg.switch_entity == gs.prev_ground) \
        & changed & ~gcfg.switch_permanent
    switch_on = (gs.switch_on | is_new) & ~is_old

    # platform group states: group g active iff any controlling switch on
    n_groups = gcfg.platform_group.shape[0]  # group ids < E by construction
    group_on = jax.vmap(
        lambda g: jnp.any(switch_on & gcfg.switch_valid & (gcfg.switch_group == g))
    )(jnp.arange(n_groups))

    is_platform = gcfg.platform_group >= 0
    plat_on = is_platform & group_on[jnp.maximum(gcfg.platform_group, 0)]
    vis_override = jnp.where(is_platform, plat_on, True)
    park = jnp.array([0.0, PLATFORM_PARK_Y, 0.0])
    pos_override = jnp.where(
        (is_platform & ~plat_on)[:, None],
        gcfg.platform_on_pos + park, gcfg.platform_on_pos,
    )

    # roster connectivity: proximity to the controlled character
    # (character_obj_update main.c:185-245)
    ctrl_pos = char_positions[gs.control]
    d = jnp.linalg.norm(char_positions - ctrl_pos[None], axis=-1)
    connected = gs.connected | (d < gcfg.connect_radius)
    connected = connected.at[gs.control].set(True)

    # cycle control to the next connected character
    n_chars = char_positions.shape[0]
    order = (gs.control + 1 + jnp.arange(n_chars)) % n_chars
    conn_in_order = connected[order]
    nxt = order[jnp.argmax(conn_in_order)]
    control = jnp.where(next_input & jnp.any(conn_in_order), nxt, gs.control)

    game_over = gs.game_over | (char_y < GAME_OVER_Y)

    return GameState(
        switch_on=switch_on,
        prev_ground=jnp.where(changed, ground_entity, gs.prev_ground).astype(jnp.int32),
        control=control.astype(jnp.int32),
        connected=connected,
        game_over=game_over,
    ), vis_override, pos_override
