"""Engine state schema (the TPU re-design of clap's pointer-soup scene).

The reference threads per-frame updates through refcounted entity objects
with callbacks (clap.c frame loop, scene.c:1159-1198, model.c:1649-1723).
Here the whole engine is ONE pytree of SoA arrays with static capacities +
validity masks, advanced by a pure jitted step. A leading env axis is
added by vmap — thousands of independent scenes per chip — and sharded
over a device mesh for scale-out (envs are embarrassingly parallel;
SURVEY §2.12).

Static (trace-time) data lives in SceneConfig: collision world, body
parameters, entity↔body wiring, per-model AABBs. Dynamic data lives in
EngineState.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..char.controller import CharParams, CharState, char_state_init
from ..physics.narrowphase import StaticWorld
from ..physics.world import BodyParams, PhysState, phys_state_init


class EntityParams(NamedTuple):
    """Static per-entity-slot data, (E,) arrays."""

    active: jnp.ndarray       # bool
    model_id: jnp.ndarray     # int32 index into model tables
    body: jnp.ndarray         # int32 physics body slot, -1 = none
    body_is_char: jnp.ndarray  # bool: body is a kinematic character capsule
    yoffset: jnp.ndarray      # f32 geom offset (duplicated from BodyParams)
    parent: jnp.ndarray       # int32 parent entity, -1 = world
    skip_culling: jnp.ndarray  # bool (terrain sets ENTITY3D_SKIP_CULLING)


class CameraState(NamedTuple):
    """3rd-person orbit camera (camera.{c,h}).

    Used both as the single ACTIVE camera (scalar leaves — the
    reference's ``s->camera`` pointer, scene.h:39) and, stacked with a
    leading (NC,) axis, as the ≤4-slot camera bank (``s->cameras``,
    scene.h:40, NR_CAMERAS_MAX)."""

    pitch: jnp.ndarray        # f32 radians
    yaw: jnp.ndarray          # f32 radians
    dist: jnp.ndarray         # f32 orbit distance
    pos: jnp.ndarray          # (3,) derived eye position


class EngineState(NamedTuple):
    """Dynamic per-env state — the vmapped pytree."""

    # entities (E slots)
    pos: jnp.ndarray          # (E, 3)
    rot: jnp.ndarray          # (E, 4) quats
    scale: jnp.ndarray        # (E,)
    visible: jnp.ndarray      # (E,) bool
    mx: jnp.ndarray           # (E, 4, 4) world matrices (refreshed per step)
    # physics
    phys: PhysState
    # characters (C slots, stacked CharState)
    chars: CharState
    # camera: the ACTIVE one (s->camera); the full ≤4-slot bank rides in
    # ``cameras`` when the scene declares more than one (s->cameras,
    # scene.h:39-40) — slot 0 is the active/controlled camera
    camera: CameraState
    # misc
    time: jnp.ndarray         # f32 seconds
    frame: jnp.ndarray        # int32
    cameras: CameraState = None  # (NC,)-stacked bank or None


class SceneConfig(NamedTuple):
    """Static per-scene data shared by every env."""

    world: StaticWorld
    bodies: BodyParams
    entities: EntityParams
    char_params: CharParams   # (C,) stacked
    model_aabb: jnp.ndarray   # (M, 2, 3) min/max per model
    limbo_height: jnp.ndarray  # f32 (scene.h limbo_height)
    gravity_y: jnp.ndarray    # f32
    camera_char: jnp.ndarray = None  # (NC,) int32 char each camera slot
                                     # follows; -1 = the CONTROLLED char
                                     # (scene_camera_follows scene.c:66)
    ent_rest_pos: jnp.ndarray = None  # (E, 3) entity load-pose positions.
                                      # When set, static-trimesh collision
                                      # FOLLOWS its owning entity: tris
                                      # translate by (pos - rest) each step
                                      # (ODE geoms ride their entities,
                                      # physics.c:789-811; None = all tri
                                      # entities are immobile, skip the work)
    ent_rest_rot: jnp.ndarray = None  # (E, 4) load-pose quats. When set
                                      # (with ent_rest_pos), tri collision
                                      # follows the FULL entity transform:
                                      # tri' = R(rot)·R(rest)⁻¹·(tri−rest_p)
                                      # + pos — rotating/animated platforms
                                      # stay solid in the right place
                                      # (physics.c:789-811). None keeps the
                                      # cheaper translation-only follow.


def engine_state_init(n_entities: int, n_bodies: int, n_chars: int,
                      n_cameras: int = 0) -> EngineState:
    """n_cameras > 0 allocates the ≤4-slot camera bank (scene.h:40);
    0 keeps the single-active-camera state (most scenes)."""
    import jax

    chars = jax.tree.map(
        lambda x: jnp.stack([x] * n_chars) if n_chars else x[None][:0],
        char_state_init(),
    )
    cameras = None
    if n_cameras:
        cameras = CameraState(
            pitch=jnp.full((n_cameras,), -0.3, jnp.float32),
            yaw=jnp.zeros((n_cameras,), jnp.float32),
            dist=jnp.full((n_cameras,), 8.0, jnp.float32),
            pos=jnp.zeros((n_cameras, 3), jnp.float32),
        )
    return EngineState(
        cameras=cameras,
        pos=jnp.zeros((n_entities, 3), jnp.float32),
        rot=jnp.tile(jnp.array([0, 0, 0, 1], jnp.float32), (n_entities, 1)),
        scale=jnp.ones((n_entities,), jnp.float32),
        visible=jnp.zeros((n_entities,), bool),
        mx=jnp.tile(jnp.eye(4, dtype=jnp.float32), (n_entities, 1, 1)),
        phys=phys_state_init(n_bodies),
        chars=chars,
        camera=CameraState(
            pitch=jnp.float32(-0.3), yaw=jnp.float32(0.0),
            dist=jnp.float32(8.0), pos=jnp.zeros(3, jnp.float32),
        ),
        time=jnp.float32(0.0),
        frame=jnp.int32(0),
    )
