"""Unified game step: simulation + gameplay rules + animation +
particles in one jitted program.

``engine_step`` covers the physics/character core (clap_frame's
move/phys/update segments); this module composes the remaining
per-frame systems the demos otherwise wire by hand — the full analogue
of the reference's frame update (clap.c:551-628 before rendering):

  engine_step → game rules (switch/platform/roster, gamelogic.py)
  → animation (state → clips → skinning matrices, anim/system.py)
  → particles (ops/particles.py)

Everything stays pure and vmap-able over envs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..anim.system import AnimConfig, AnimInstance, AnimSfx, anim_step
from ..ops.particles import ParticleParams, ParticleState, particles_update
from .gamelogic import GameConfig, GameState, game_update
from .state import EngineState, SceneConfig
from .step import Inputs, engine_step


class GameWorld(NamedTuple):
    """Static configuration of the full game (per scene)."""

    scene: SceneConfig
    game: GameConfig | None = None
    anim: AnimConfig | None = None
    anim_sk: object = None          # Skeleton
    anim_lib: object = None         # AnimLibrary
    particles: ParticleParams | None = None
    particle_entity: jnp.ndarray | None = None   # (S,) entity each system tracks
    # joint-space attachment (model.h:387-405, model.c:1594-1647: an
    # entity rides a joint of its parent's animated skeleton)
    attach_joint: jnp.ndarray | None = None      # (E,) int32 joint id, -1 none
    attach_offset: jnp.ndarray | None = None     # (E, 3) local offset
    entity_char: jnp.ndarray | None = None       # (E,) char rig slot, -1 none
    # armature semantics (model.h:30-38 joint_type / scene.c:1474-1492
    # "armature" block): the camera aims at the rig's JOINT_HEAD
    head_joint: jnp.ndarray | None = None        # (C,) int32 joint, -1 none
    char_entity: jnp.ndarray | None = None       # (C,) int32 entity per char
    char_height: jnp.ndarray | None = None       # (C,) f32 AABB height
    # near-plane-corner occlusion shrink every frame. The reference
    # camera occlusion-raycasts UNCONDITIONALLY each frame
    # (camera.c:232-236), so the composed default is ON and every
    # composed/flagship number absorbs the ~4-ray cost; pure headless
    # sims (no rendering, camera unused) may pass False explicitly —
    # the documented off-switch.
    camera_occlusion: bool = True
    # per-clip frame-SFX table (animation_sfx scene.c:1295-1303); when
    # set, game_step emits per-char footstep events in
    # GameSessionState.sfx_events (init anim with anim_instances_init(n,
    # with_sfx=True) and sfx_events with zeros so the treedef is stable)
    sfx: AnimSfx | None = None


class GameSessionState(NamedTuple):
    """Dynamic state of the full game."""

    engine: EngineState
    game: GameState | None = None
    anim: AnimInstance | None = None             # BATCHED over all C rigs
    particles: ParticleState | None = None
    joint_mats: jnp.ndarray | None = None        # (C, J, 4, 4) current poses
    sfx_events: jnp.ndarray | None = None        # (C, 2) bool [left, right]
                                                 # footstep fired this frame


def game_step(gw: GameWorld, gs: GameSessionState, inputs: Inputs,
              dt=jnp.float32(1.0 / 60.0),
              next_character=None,
              camera_occlusion: bool | None = None) -> GameSessionState:
    """One full frame of simulation + gameplay."""
    # camera + rules follow the roster-controlled slot (scene->control,
    # scene_control_next scene.c:23-55); previous frame's control is
    # correct — the switch lands during input handling, before move.
    ctrl = gs.game.control if gs.game is not None else None

    # head-joint camera target (camera_target camera.c:174-206): the
    # rig's JOINT_HEAD world position + 0.2·height, from the PREVIOUS
    # frame's joint matrices (the reference animates before the camera
    # within one frame; here the head rides one frame behind — ~1 cm of
    # bob lag at 60 Hz, invisible)
    head_target = None
    if (gw.head_joint is not None and gw.char_entity is not None
            and gs.joint_mats is not None):
        bind = jnp.linalg.inv(gw.anim_sk.invbind)        # (J, 4, 4) const
        hj = jnp.maximum(gw.head_joint, 0)               # (C,)
        # joint global = skinning · bind; head world = entity mx · global
        glob_h = jnp.einsum("cik,ckl->cil",
                            gs.joint_mats[jnp.arange(hj.shape[0]), hj],
                            bind[hj])                     # (C, 4, 4)
        emx = gs.engine.mx[gw.char_entity]                # (C, 4, 4)
        hpos = jnp.einsum("cij,cj->ci", emx,
                          glob_h[:, :, 3])[:, :3]         # (C, 3)
        if gw.char_height is not None:
            hpos = hpos.at[:, 1].add(0.2 * gw.char_height)
        head_target = (hpos, gw.head_joint >= 0)

    occl = (gw.camera_occlusion if camera_occlusion is None
            else camera_occlusion)
    st = engine_step(gw.scene, gs.engine, inputs, dt, control=ctrl,
                     head_target=head_target, camera_occlusion=occl)

    game = gs.game
    if gw.game is not None and game is not None:
        # controlled character's ground entity, as reported by the
        # controller's ground ray (tri_entity/hf_entity mapping — the
        # real character.c:490-496 hook, no terrain-only stub)
        ground_ent = st.chars.collision[game.control].astype(jnp.int32)
        char_body = gw.scene.char_params.body
        char_pos = st.phys.pos[char_body]
        nxt = next_character if next_character is not None else jnp.array(False)
        game, vis, pos = game_update(gw.game, game, ground_ent, char_pos,
                                     st.phys.pos[char_body[game.control], 1],
                                     nxt)
        is_plat = gw.game.platform_group >= 0
        st = st._replace(
            visible=jnp.where(is_plat, vis, st.visible),
            pos=jnp.where(is_plat[:, None], pos, st.pos),
        )

    anim = gs.anim
    jt = gs.joint_mats
    sfx_events = gs.sfx_events
    if gw.anim is not None and anim is not None:
        # EVERY rig animates every frame (mq_update walks all entities →
        # animated_update, model.c:1953/1563) — anim is a batched
        # AnimInstance over the C character rigs, advanced by one vmap
        if gw.sfx is not None:
            anim, jt, sfx_events = jax.vmap(
                lambda a, s: anim_step(gw.anim, gw.anim_sk, gw.anim_lib,
                                       a, s, dt, sfx=gw.sfx)
            )(anim, st.chars.state)                       # jt: (C, J, 4, 4)
        else:
            anim, jt = jax.vmap(
                lambda a, s: anim_step(gw.anim, gw.anim_sk, gw.anim_lib,
                                       a, s, dt)
            )(anim, st.chars.state)
        if gw.attach_joint is not None:
            # joint riding (parent_transform_apply model.c:1594-1647):
            # child world = parent_mx · joint_global · offset. joint
            # globals recovered from the skinning matrices via the
            # inverse bind: global = jt · bind.
            bind = jnp.linalg.inv(gw.anim_sk.invbind)
            glob = jnp.einsum("cjik,jkl->cjil", jt, bind)  # (C, J, 4, 4)
            has = gw.attach_joint >= 0
            j = jnp.maximum(gw.attach_joint, 0)
            parent = jnp.maximum(gw.scene.entities.parent, 0)
            if gw.entity_char is not None:
                pchar = jnp.maximum(gw.entity_char[parent], 0)
            else:
                pchar = jnp.zeros_like(parent)
            ride = jnp.einsum("eij,ejk->eik", st.mx[parent],
                              glob[pchar, j])
            new_pos = jnp.einsum(
                "eij,ej->ei", ride[:, :3, :3], gw.attach_offset
            ) + ride[:, :3, 3]
            cond = has & (gw.scene.entities.parent >= 0)
            st = st._replace(
                pos=jnp.where(cond[:, None], new_pos, st.pos),
                mx=jnp.where(cond[:, None, None],
                             ride.at[:, :3, 3].set(new_pos), st.mx),
            )

    parts = gs.particles
    if gw.particles is not None and parts is not None:
        centers = st.pos[gw.particle_entity]
        parts = particles_update(gw.particles, parts, centers)

    return GameSessionState(engine=st, game=game, anim=anim,
                            particles=parts, joint_mats=jt,
                            sfx_events=sfx_events)
