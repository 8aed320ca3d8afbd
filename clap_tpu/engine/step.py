"""The per-frame engine step (clap_frame, clap.c:551-665, headless part).

Order mirrors the reference frame loop:
  input → scene_characters_move (motion → character_move) → phys_step →
  scene_update (entity transforms from physics, TRS rebuild) → limbo →
  camera update.

The whole step is one pure function of (SceneConfig, EngineState, Inputs)
→ EngineState, jit-compiled once and vmapped over the env axis. No
data-dependent Python control flow — characters iterate as a trace-time
loop over static char slots, everything else is masked array math.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import mathx as mx
from ..char import controller as C
from ..physics import world as W
from .state import CameraState, EngineState, SceneConfig


class Inputs(NamedTuple):
    """Per-frame input record (the headless subset of struct
    message_input, messagebus.h:33-89)."""

    motion: jnp.ndarray   # (C, 2) dx, dz per character (camera-relative)
    jump: jnp.ndarray     # (C,) bool
    cam_delta: jnp.ndarray  # (3,) pitch, yaw, dist deltas
    dash: jnp.ndarray = None  # (C,) bool (optional; ×1.5 speed burst)


def inputs_zero(n_chars: int) -> Inputs:
    # dash is populated (not None) so Inputs has a STABLE treedef —
    # a None leaf changes the pytree structure, breaking sharding and
    # serialization round-trips
    return Inputs(
        motion=jnp.zeros((n_chars, 2), jnp.float32),
        jump=jnp.zeros((n_chars,), bool),
        cam_delta=jnp.zeros(3, jnp.float32),
        dash=jnp.zeros((n_chars,), bool),
    )


def _characters_move(cfg: SceneConfig, st: EngineState, inputs: Inputs, dt):
    """scene_characters_move (scene.c:1058) → character_move per char.

    Rosters of ≤2 characters update sequentially (later characters see
    earlier ones' new body positions, exactly like the C entity-list
    walk). Larger rosters move as ONE vmapped batch against the
    pre-move body positions: the traced graph stays constant-size in C
    instead of C copies of the controller, at the cost of same-frame
    char-vs-char sweep visibility — a one-frame lag that only matters
    when two characters cross within one step (~3 cm at walk speed)."""
    body_pos = st.phys.pos
    n_chars = cfg.char_params.body.shape[0]
    if n_chars == 0:
        return st
    if n_chars <= 2:
        new_chars = []
        for ci in range(n_chars):
            cp = jax.tree.map(lambda x: x[ci], cfg.char_params)
            cs = jax.tree.map(lambda x: x[ci], st.chars)
            dash = None if inputs.dash is None else inputs.dash[ci]
            p_new, cs2 = C.character_move(
                cfg.world, cfg.bodies, cp, cs, body_pos,
                inputs.motion[ci, 0], inputs.motion[ci, 1],
                inputs.jump[ci], dt, dash_input=dash,
            )
            body_pos = body_pos.at[cp.body].set(p_new)
            new_chars.append(cs2)
        chars = jax.tree.map(lambda *xs: jnp.stack(xs), *new_chars)
        return st._replace(phys=st.phys._replace(pos=body_pos), chars=chars)

    dash = inputs.dash if inputs.dash is not None \
        else jnp.zeros((n_chars,), bool)

    def move_one(cp, cs, mot, jmp, dsh):
        return C.character_move(cfg.world, cfg.bodies, cp, cs, body_pos,
                                mot[0], mot[1], jmp, dt, dash_input=dsh)

    p_new, chars = jax.vmap(move_one)(cfg.char_params, st.chars,
                                      inputs.motion, inputs.jump, dash)
    body_pos = body_pos.at[cfg.char_params.body].set(p_new)
    return st._replace(phys=st.phys._replace(pos=body_pos), chars=chars)


def _apply_char_push(cfg: SceneConfig, st: EngineState, dt):
    """phys_body_push (physics.c:677-693): the character shoves the
    dynamic body its sweep ran into with force F = m_char·v_char
    (Δv = m_char·v_char·dt/m_body) and re-enables it — so characters can
    push boxes and wake sleeping bodies by walking into them."""
    n_chars = cfg.char_params.body.shape[0]
    vel = st.phys.vel
    disabled = st.phys.disabled
    dyn = cfg.bodies.active & ~cfg.bodies.kinematic
    n = vel.shape[0]
    inv_m = 1.0 / jnp.maximum(cfg.bodies.mass, 1e-6)
    for ci in range(n_chars):
        b = st.chars.push_body[ci]
        sel = (jnp.arange(n) == b) & dyn
        m_char = cfg.bodies.mass[cfg.char_params.body[ci]]
        dv = st.chars.velocity[ci][None, :] * (m_char * dt * inv_m)[:, None]
        vel = vel + jnp.where(sel[:, None], dv, 0.0)
        disabled = disabled & ~sel
    return st._replace(phys=st.phys._replace(vel=vel, disabled=disabled))


def _limbo(cfg: SceneConfig, st: EngineState):
    """character_update's limbo teleport (character.c:546-599)."""
    body_pos = st.phys.pos
    n_chars = cfg.char_params.body.shape[0]
    new_chars = []
    for ci in range(n_chars):
        cp = jax.tree.map(lambda x: x[ci], cfg.char_params)
        cs = jax.tree.map(lambda x: x[ci], st.chars)
        bp = body_pos[cp.body]
        entity_pos = bp - jnp.array([0.0, 1.0, 0.0]) * cfg.bodies.yoffset[cp.body]
        new_pos, cs2, fell = C.limbo_rescue(cs, entity_pos, cfg.limbo_height)
        geom_pos = new_pos + jnp.array([0.0, 1.0, 0.0]) * cfg.bodies.yoffset[cp.body]
        body_pos = body_pos.at[cp.body].set(jnp.where(fell, geom_pos, bp))
        # falling stops on teleport
        cs2 = cs2._replace(
            velocity=jnp.where(fell, jnp.zeros(3), cs2.velocity))
        new_chars.append(cs2)
    if n_chars:
        chars = jax.tree.map(lambda *xs: jnp.stack(xs), *new_chars)
    else:
        chars = st.chars
    return st._replace(phys=st.phys._replace(pos=body_pos), chars=chars)


def _scene_update(cfg: SceneConfig, st: EngineState):
    """mq_update → entity3d default_update (model.c:1649-1723): sync
    entity transforms from physics bodies, rebuild world matrices."""
    ent = cfg.entities
    has_body = ent.body >= 0
    b = jnp.maximum(ent.body, 0)
    # entity←body pull as ONE one-hot matmul over the static body map
    # (the (E,) gathers of pos+quat cost ~3 ms/step at 4096 envs; the
    # one-hot (E, N) is a trace-time constant and the selection is exact
    # under HIGHEST precision)
    onehot = (b[:, None] == jnp.arange(st.phys.pos.shape[0])[None, :]
              ).astype(jnp.float32)                       # (E, N) const
    bodydat = jnp.concatenate([st.phys.pos, st.phys.quat], axis=-1)
    ent_bd = jax.lax.dot(onehot, bodydat,
                         precision=jax.lax.Precision.HIGHEST)  # (E, 7)
    geom_pos = ent_bd[:, :3]
    off = jnp.zeros_like(geom_pos).at[:, 1].set(cfg.bodies.yoffset[b])
    pos = jnp.where(has_body[:, None], geom_pos - off, st.pos)
    # dynamic-body rotation sync (phys_body_update physics.c:789-811,
    # consumed at model.c:1665); characters stay upright — the
    # controller owns their yaw (physics.c:800-809)
    dyn = has_body & ~ent.body_is_char
    rot = jnp.where(dyn[:, None], ent_bd[:, 3:7], st.rot)
    st = st._replace(rot=rot)

    # parent attachment (world-space; joint riding arrives with skinning)
    has_parent = ent.parent >= 0
    p = jnp.maximum(ent.parent, 0)
    pos = jnp.where(has_parent[:, None], pos + st.pos[p], pos)

    mxs = mx.mat4_compose_trs(pos, st.rot, st.scale)
    return st._replace(pos=pos, mx=mxs)


def _camera_update(cfg: SceneConfig, st: EngineState, inputs: Inputs,
                   control=None, head_target=None,
                   camera_occlusion: bool = False):
    """Orbit camera (camera.c:208-246): pitch-clamped quat orbit around
    the controlled character's target point.

    ``control`` (int32 scalar, optional) retargets the orbit onto the
    roster-controlled character slot when the player switches characters
    (scene_control_next scene.c:23-55 re-points scene->control and the
    camera follows); None keeps the static slot-0 target.

    ``head_target``: optional ((C, 3) pos, (C,) valid) — per-character
    head-joint world positions. A valid head retargets the orbit onto
    the head (camera_target camera.c:174-206: the skinned rig's
    JOINT_HEAD frames the face instead of the chest).

    ``camera_occlusion=True`` runs the near-plane-corner raycast shrink
    (camera_position_is_good camera.c:93-117, retry loop 232-236): the
    boom shortens so terrain/walls never cut between camera and
    character. The camera state keeps the DESIRED distance (input-
    controlled); only the derived eye position shrinks — exactly the
    reference's dist-vs-next_distance search, re-run every frame."""
    occl = None
    if camera_occlusion:
        from ..render.camera import camera_update as occl
    def head_override(target, follow):
        if head_target is None:
            return target
        hpos, hvalid = head_target
        c = jnp.clip(follow, 0, hpos.shape[0] - 1)
        return jnp.where(hvalid[c], hpos[c], target)

    if st.cameras is not None and cfg.camera_char is not None:
        # multi-camera bank (≤4 slots, scene.h:39-40): every slot tracks
        # its target every frame (scene_cameras_calc scene.c:1050-1055);
        # input deltas steer slot 0, the active camera
        cams = st.cameras
        pitch = jnp.clip(cams.pitch.at[0].add(inputs.cam_delta[0]),
                         -1.45, 1.45)
        yaw = jnp.mod(cams.yaw.at[0].add(inputs.cam_delta[1]) + jnp.pi,
                      2 * jnp.pi) - jnp.pi
        dist = jnp.clip(cams.dist.at[0].add(inputs.cam_delta[2]),
                        1.0, 50.0)
        ctrl = jnp.int32(0) if control is None else control
        follow = jnp.where(cfg.camera_char >= 0, cfg.camera_char, ctrl)
        b = cfg.char_params.body[jnp.clip(
            follow, 0, cfg.char_params.body.shape[0] - 1)]
        targets = st.phys.pos[b]                        # (NC, 3)
        targets = jax.vmap(head_override)(targets, follow)

        if occl is not None:
            eyes = jax.vmap(
                lambda t, p, y, d: occl(cfg.world, t, p, y, d)[0]
            )(targets, pitch, yaw, dist)
        else:
            def orbit(p, y, d, t):
                q = mx.qmul(
                    mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), y),
                    mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), p),
                )
                return mx.transform_orbit(q, t, d)

            eyes = jax.vmap(orbit)(pitch, yaw, dist, targets)
        cams2 = CameraState(pitch=pitch, yaw=yaw, dist=dist, pos=eyes)
        active = jax.tree.map(lambda x: x[0], cams2)
        return st._replace(camera=active, cameras=cams2)

    cam = st.camera
    pitch = jnp.clip(cam.pitch + inputs.cam_delta[0], -1.45, 1.45)
    yaw = jnp.mod(cam.yaw + inputs.cam_delta[1] + jnp.pi, 2 * jnp.pi) - jnp.pi
    dist = jnp.clip(cam.dist + inputs.cam_delta[2], 1.0, 50.0)

    # target: controlled character at ~3/4 height (camera.c:174-206)
    if control is None:
        follow = jnp.int32(0)
        b0 = cfg.char_params.body[0] if cfg.char_params.body.shape[0] else 0
    else:
        follow = control
        b0 = cfg.char_params.body[control] \
            if cfg.char_params.body.shape[0] else 0
    target = head_override(st.phys.pos[b0], follow)

    if occl is not None:
        eye, q, _deff = occl(cfg.world, target, pitch, yaw, dist)
    else:
        q = mx.qmul(
            mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw),
            mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), pitch),
        )
        eye = mx.transform_orbit(q, target, dist)
    return st._replace(camera=CameraState(pitch=pitch, yaw=yaw, dist=dist, pos=eye))


def engine_step(cfg: SceneConfig, st: EngineState, inputs: Inputs,
                dt=jnp.float32(1.0 / 60.0), max_substeps: int = 2,
                control=None, head_target=None,
                camera_occlusion: bool = False) -> EngineState:
    """One headless frame. Pure; jit/vmap over envs.

    max_substeps=2 is exact for 60 Hz frames (dt/FIXED_DT = 2); pass up
    to world.MAX_SUBSTEPS (5, the reference cap) for variable frame
    rates. ``control`` optionally retargets the camera onto the
    roster-controlled character; ``head_target``/``camera_occlusion``
    feed the camera (see _camera_update — occlusion raycasts cost ~4×3
    heightfield marches/env, so headless sims leave it off; Engine turns
    it on with graphics, the context where a clipping boom is visible).
    """
    # static-trimesh validity follows entity VISIBILITY: an invisible
    # entity's collision is gone (the reference parks hidden platforms
    # +100 up AND strips VISIBLE, main.c:96-138 — collision follows the
    # entity state, so data-driven platform groups become solid/phantom
    # per env)
    world = cfg.world
    if world.tri_entity is not None:
        te = world.tri_entity
        tvis = (te < 0) | st.visible[jnp.maximum(te, 0)]
        world = world._replace(tri_valid=world.tri_valid & tvis)
        if cfg.ent_rest_pos is not None:
            # trimesh collision FOLLOWS its entity (ODE geoms ride
            # entity transforms, physics.c:789-811). One-hot MXU
            # matmul — the per-entity transform is per-env under vmap,
            # and a (T,) gather of a per-env table would be a
            # batched-operand gather; the (T, E) one-hot is a
            # trace-time constant.
            oh = (jnp.maximum(te, 0)[:, None]
                  == jnp.arange(st.pos.shape[0])[None, :]
                  ).astype(jnp.float32)                  # (T, E) const
            owned = (te >= 0)[:, None]
            if cfg.ent_rest_rot is None:
                # translation-only follow (visibility-toggled platforms)
                delta = jax.lax.dot(oh, st.pos - cfg.ent_rest_pos,
                                    precision=jax.lax.Precision.HIGHEST)
                delta = jnp.where(owned, delta, 0.0)
                world = world._replace(tris=world.tris + delta[:, None, :])
            else:
                # FULL transform follow: tri' = R_rel·(tri − rest_p) +
                # pos, R_rel = R(rot)·R(rest)⁻¹ — rotating platforms'
                # collision rides their orientation (physics.c:789-811)
                E = st.pos.shape[0]
                r_rel = jnp.einsum(
                    "eab,ecb->eac", mx.mat3_from_quat(st.rot),
                    mx.mat3_from_quat(cfg.ent_rest_rot))   # R·R_restᵀ
                feat = jnp.concatenate(
                    [r_rel.reshape(E, 9), st.pos], axis=-1)  # (E, 12)
                f = jax.lax.dot(oh, feat,
                                precision=jax.lax.Precision.HIGHEST)
                r_t = f[:, :9].reshape(-1, 3, 3)             # (T, 3, 3)
                pos_t = f[:, 9:12]
                rest_t = jax.lax.dot(oh, cfg.ent_rest_pos,
                                     precision=jax.lax.Precision.HIGHEST)
                local = world.tris - rest_t[:, None, :]
                moved = jnp.einsum("tab,tcb->tca", r_t, local) \
                    + pos_t[:, None, :]
                world = world._replace(
                    tris=jnp.where(owned[:, None], moved, world.tris))
        cfg = cfg._replace(world=world)
    st = _characters_move(cfg, st, inputs, dt)
    st = _apply_char_push(cfg, st, dt)
    st = st._replace(phys=W.phys_step(world, cfg.bodies, st.phys, dt,
                                      max_substeps))
    st = _limbo(cfg, st)
    st = _scene_update(cfg, st)
    st = _camera_update(cfg, st, inputs, control, head_target,
                        camera_occlusion)
    return st._replace(time=st.time + dt, frame=st.frame + 1)
