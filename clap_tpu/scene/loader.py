"""scene.json loader (reference: scene.c:1318-1924 model_new_from_json /
scene_onload / scene_load).

Host-side scene ingestion with the reference's schema:

- ``model[]``: {name, gltf, physics: {geom, mass, bounce, bounce_vel,
  yoffset, radius}, entity[]/character[]: {position [x,y,z], rotation,
  scale, attach, light_idx/light_color/light_attenuation, bloom_*},
  armature semantic-joint mapping, animation renames}
- ``light[]``: {position, color, attenuation, direction, cutoff}
- scene-level: name, fog/lut options, limbo_height

Produces the device SceneConfig + EngineState plus render geometry —
the JAX analogue of instantiating refcounted entities. scene_save
re-serializes the same schema (scene.c:1891-1922).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..char.controller import CharParams
from ..engine.state import EngineState, EntityParams, SceneConfig, engine_state_init
from ..physics.heightfield import make_heightfield
from ..physics.narrowphase import make_world
from ..physics.world import (BodyParams, body_params_empty,
                             capsule_auto_size, finalize_inertia)
from ..render.lights import Lights, lights_empty
from .gltf import build_rig, find_collision_mesh, load_gltf

GEOM_CLASSES = {"sphere": 1, "capsule": 2, "trimesh": 3}


@dataclass
class LoadedModel:
    name: str
    mesh: object
    collision: object
    rig: tuple | None
    materials: list
    physics: dict = field(default_factory=dict)
    images: list = field(default_factory=list)       # raw PNG bytes
    tex_source: list = field(default_factory=list)   # texture→image idx
    joint_types: dict = field(default_factory=dict)  # semantic → joint idx
                                                     # (model.h:30-38, from
                                                     # the "armature" block)


@dataclass
class LoadedScene:
    name: str
    cfg: SceneConfig
    state0: EngineState
    lights: Lights
    models: list
    doc: dict                      # retained JSON DOM for scene_save
    entity_names: list = field(default_factory=list)
    game: object = None            # GameConfig when the scene declares
                                   # switch/platform gameplay blocks
    char_entities: list = field(default_factory=list)  # entity per char
    char_models: list = field(default_factory=list)    # model per char
    char_heights: list = field(default_factory=list)   # AABB y per char

    def char_armature(self):
        """Per-character semantic-joint arrays for GameWorld: resolves
        each character's model "armature" block to (C,) joint indices
        (the model3d_get_joint consumers: camera head target
        camera.c:174-206, footstep SFX hooks). Returns a dict with
        head_joint / foot_left / foot_right / char_entity / char_height
        as device arrays (-1 = the model exposes no such joint)."""
        C = max(len(self.char_entities), 1)

        def sem(which):
            vals = [self.models[m].joint_types.get(which, -1)
                    for m in self.char_models] or [-1]
            return jnp.asarray(vals + [-1] * (C - len(vals)), jnp.int32)

        return {
            "head_joint": sem("head"),
            "foot_left": sem("foot_left"),
            "foot_right": sem("foot_right"),
            "char_entity": jnp.asarray(
                (self.char_entities or [0]) +
                [0] * (C - max(len(self.char_entities), 1)), jnp.int32),
            "char_height": jnp.asarray(
                (self.char_heights or [2.0]) +
                [2.0] * (C - max(len(self.char_heights), 1)), jnp.float32),
        }


def _mat4_from_trs(pos, rot, scale):
    from .. import mathx as mx

    return np.asarray(mx.mat4_compose_trs(
        jnp.asarray(pos, jnp.float32), jnp.asarray(rot, jnp.float32),
        jnp.asarray(scale, jnp.float32)))


def load_scene(doc_json: str, asset_loader=None, heightfield=None,
               max_entities: int = 64, max_bodies: int = 16,
               max_lights: int = 8) -> LoadedScene:
    """Parse a scene.json document into device structures.

    asset_loader(name) → raw glTF bytes for ``gltf`` refs (the librarian
    analogue, librarian.h:39-43); heightfield optionally supplies
    terrain (terrain-driven scenes build it procedurally instead of from
    a model entry)."""
    doc = json.loads(doc_json)

    models = []
    entities = []      # (model_idx, entity_dict, is_char)
    for mentry in doc.get("model", []):
        mesh = coll = rig = None
        materials, images, tex_source = [], [], []
        joint_types = {}
        if asset_loader is not None and mentry.get("gltf"):
            gdoc = load_gltf(asset_loader(mentry["gltf"]))
            mesh, coll = find_collision_mesh(gdoc)
            materials = gdoc.materials
            images = gdoc.images
            tex_source = gdoc.textures
            if gdoc.skins:
                rig = build_rig(gdoc)
                # "armature": {"head": "<joint name>", ...} resolves
                # exporter joint names to semantic slots the camera/
                # attachment/SFX code keys on (scene.c:1474-1492,
                # model.h:30-38 JOINT_HEAD..JOINT_HAND_RIGHT)
                from .gltf import resolve_armature

                joint_types = resolve_armature(
                    gdoc, mentry.get("armature", {}), rig[3])
                # "animations": {"motion": "<gltf clip name>", ...}
                # renames exporter clip names to the engine's
                # state-machine names (scene.c:1662-1684: idle/motion/
                # jump/fall drive character_set_state's pushes)
                renames = mentry.get("animations", {})
                if renames:
                    sk_r, lib_r, names_r, remap_r = rig
                    names_r = list(names_r)
                    for new_name, gltf_name in renames.items():
                        if gltf_name in names_r:
                            names_r[names_r.index(gltf_name)] = new_name
                    rig = (sk_r, lib_r, names_r, remap_r)
        lm = LoadedModel(
            name=mentry.get("name", mentry.get("gltf", "model")),
            mesh=mesh, collision=coll, rig=rig, materials=materials,
            physics=mentry.get("physics", {}),
            images=images, tex_source=tex_source,
            joint_types=joint_types,
        )
        mi = len(models)
        models.append(lm)
        for e in mentry.get("entity", []):
            entities.append((mi, e, False))
        for c in mentry.get("character", []):
            entities.append((mi, c, True))

    n_chars = sum(1 for _, _, ic in entities if ic)

    # cameras (≤4 slots, scene.h:40 NR_CAMERAS_MAX): scene.json
    # ``camera`` entries {pitch, yaw, dist, character} — character is
    # the char index the slot follows, -1 follows the controlled one
    cam_entries = doc.get("camera", [])[:4]
    n_cameras = len(cam_entries)

    # physics bodies: one per entity with a physics block (+ characters)
    bodies = body_params_empty(max_bodies)
    ent = EntityParams(
        active=jnp.zeros((max_entities,), bool),
        model_id=jnp.zeros((max_entities,), jnp.int32),
        body=jnp.full((max_entities,), -1, jnp.int32),
        body_is_char=jnp.zeros((max_entities,), bool),
        yoffset=jnp.zeros((max_entities,), jnp.float32),
        parent=jnp.full((max_entities,), -1, jnp.int32),
        skip_culling=jnp.zeros((max_entities,), bool),
    )
    st = engine_state_init(max_entities, max_bodies, max(n_chars, 1),
                           n_cameras=n_cameras)
    if n_cameras:
        cams = st.cameras._replace(
            pitch=jnp.asarray([float(c.get("pitch", -0.3))
                               for c in cam_entries], jnp.float32),
            yaw=jnp.asarray([float(c.get("yaw", 0.0))
                             for c in cam_entries], jnp.float32),
            dist=jnp.asarray([float(c.get("dist", 8.0))
                              for c in cam_entries], jnp.float32),
        )
        import jax as _jax

        st = st._replace(cameras=cams,
                         camera=_jax.tree.map(lambda x: x[0], cams))

    char_bodies = []
    char_speeds = []
    char_jf = []
    char_ju = []
    char_entities = []     # entity slot per char (for head-joint riding)
    char_models = []       # model idx per char (armature semantics)
    char_heights = []      # AABB height per char (camera_target ¾/0.2·h)
    entity_names = []
    name_to_idx = {}
    body_slot = 0
    tris_accum = []
    tri_ent_accum = []
    # gameplay blocks (the ldjam57 wiring as DATA: switch_connect/
    # disconnect + platform groups, main.c:82-138):
    #   entity: {"switch": {"group": g, "permanent": bool}}
    #   entity: {"platform": {"group": g, "on_pos": [x,y,z]}}
    switches = []                  # (entity_idx, group, permanent)
    platforms = []                 # (entity_idx, group, on_pos)

    for ei, (mi, e, is_char) in enumerate(entities):
        if ei >= max_entities:
            break
        lm = models[mi]
        pos = np.array(e.get("position", [0, 0, 0]), np.float32)
        scale = float(e.get("scale", 1.0))
        rot = e.get("rotation", [0, 0, 0, 1])
        if len(rot) == 3:  # euler degrees (scene.json convention)
            from .. import mathx as mx

            r = np.deg2rad(np.array(rot, np.float32))
            rot = np.asarray(mx.quat_from_euler_xyz(*[jnp.float32(x) for x in r]))
        rot = np.array(rot, np.float32)

        ename = e.get("name", f"{lm.name}.{ei}")
        entity_names.append(ename)
        name_to_idx[ename] = ei

        ent = ent._replace(
            active=ent.active.at[ei].set(True),
            model_id=ent.model_id.at[ei].set(mi),
        )
        st = st._replace(
            pos=st.pos.at[ei].set(jnp.asarray(pos)),
            rot=st.rot.at[ei].set(jnp.asarray(rot)),
            scale=st.scale.at[ei].set(scale),
            visible=st.visible.at[ei].set(True),
        )

        sw = e.get("switch")
        if sw is not None:
            switches.append((ei, int(sw.get("group", 0)),
                             bool(sw.get("permanent", False))))
        pf = e.get("platform")
        if pf is not None:
            platforms.append((ei, int(pf.get("group", 0)),
                              pf.get("on_pos", [float(x) for x in pos])))

        phys = lm.physics
        geom = GEOM_CLASSES.get(phys.get("geom", ""), 0)
        if (geom or is_char) and body_slot < max_bodies:
            coll_mesh = lm.collision if lm.collision is not None else lm.mesh
            if geom == 3 and coll_mesh is not None:
                # static trimesh baked into world space; the named
                # "collision" mesh wins, else the render mesh serves
                # (scene.c:1392-1421 convention)
                m = _mat4_from_trs(pos, rot, scale)
                v = coll_mesh.verts @ m[:3, :3].T + m[:3, 3]
                tv = v[coll_mesh.indices.reshape(-1, 3)]
                tris_accum.append(tv)
                tri_ent_accum.append(np.full((tv.shape[0],), ei, np.int32))
            else:
                aabb = (1.0, 2.0, 1.0)
                if lm.mesh is not None:
                    ext = lm.mesh.verts.max(0) - lm.mesh.verts.min(0)
                    aabb = tuple(np.maximum(ext * scale, 1e-3))
                r, hl, yoff, ray_off = capsule_auto_size(
                    *aabb, geom_radius=phys.get("radius", 0.0) * scale,
                    geom_offset=phys.get("yoffset", 0.0) * scale)
                bi = body_slot
                bodies = bodies._replace(
                    active=bodies.active.at[bi].set(True),
                    kinematic=bodies.kinematic.at[bi].set(is_char),
                    radius=bodies.radius.at[bi].set(r),
                    half_len=bodies.half_len.at[bi].set(hl),
                    yoffset=bodies.yoffset.at[bi].set(yoff),
                    ray_off=bodies.ray_off.at[bi].set(ray_off),
                    mass=bodies.mass.at[bi].set(phys.get("mass", 1.0)),
                    bounce=bodies.bounce.at[bi].set(phys.get("bounce", 0.0)),
                    bounce_vel=bodies.bounce_vel.at[bi].set(
                        phys.get("bounce_vel", 0.0)),
                )
                ent = ent._replace(
                    body=ent.body.at[ei].set(bi),
                    body_is_char=ent.body_is_char.at[ei].set(is_char),
                    yoffset=ent.yoffset.at[ei].set(yoff),
                )
                st = st._replace(phys=st.phys._replace(
                    pos=st.phys.pos.at[bi].set(
                        jnp.asarray(pos + np.array([0, yoff, 0], np.float32)))
                ))
                if is_char:
                    char_bodies.append(bi)
                    aabb_y = aabb[1]
                    char_speeds.append(aabb_y * float(e.get("speed", 1.2)))
                    char_jf.append(float(e.get("jump_forward", 1.2)))
                    char_ju.append(float(e.get("jump_upward", 5.0)))
                    char_entities.append(ei)
                    char_models.append(mi)
                    char_heights.append(float(aabb_y))
                body_slot += 1

    bodies = finalize_inertia(bodies)

    # attachments (second pass: parent by name, scene.c:1594-1641)
    for ei, (mi, e, _) in enumerate(entities):
        if ei >= max_entities:
            break
        att = e.get("attach")
        if att and att in name_to_idx:
            ent = ent._replace(parent=ent.parent.at[ei].set(name_to_idx[att]))

    # lights (scene.c:1726-1815)
    lights = lights_empty(max_lights)
    for li, l in enumerate(doc.get("light", [])):
        if li >= max_lights:
            break
        pos = np.array(l.get("position", [0, 0, 0]), np.float32)
        is_dir = bool(l.get("directional", False)) or "direction" in l
        direc = np.array(l.get("direction", [0, -1, 0]), np.float32)
        direc = direc / max(np.linalg.norm(direc), 1e-6)
        lights = lights._replace(
            pos=lights.pos.at[li].set(jnp.asarray(pos)),
            color=lights.color.at[li].set(
                jnp.asarray(np.array(l.get("color", [1, 1, 1]), np.float32))),
            attenuation=lights.attenuation.at[li].set(jnp.asarray(np.array(
                l.get("attenuation", [1, 0, 0]), np.float32))),
            direction=lights.direction.at[li].set(jnp.asarray(direc)),
            cutoff=lights.cutoff.at[li].set(float(l.get("cutoff", -2.0))),
            is_dir=lights.is_dir.at[li].set(is_dir),
            active=lights.active.at[li].set(True),
        )

    if heightfield is None:
        flat = np.zeros((9, 9), np.float32)
        nrm = np.zeros((9, 9, 3), np.float32)
        nrm[..., 1] = 1
        heightfield = make_heightfield(flat, nrm, [-512.0, -512.0], 1024.0)
    tris = np.concatenate(tris_accum) if tris_accum else None
    tri_ents = np.concatenate(tri_ent_accum) if tri_ent_accum else None
    # the terrain heightfield is not a scene.json entity: its ground id
    # is -1, NOT entity slot 0 (which is whatever loaded first — a
    # terrain id of 0 made standing on the ground read as standing on
    # the first entity, falsely tripping its switch block)
    world = make_world(heightfield, None if tris is None else jnp.asarray(tris),
                       tri_entity=None if tri_ents is None else jnp.asarray(tri_ents),
                       hf_entity=-1)

    char_params = CharParams(
        body=jnp.asarray(char_bodies or [0], jnp.int32),
        lin_speed=jnp.asarray(char_speeds or [2.0], jnp.float32),
        jump_forward=jnp.asarray(char_jf or [1.2], jnp.float32),
        jump_upward=jnp.asarray(char_ju or [5.0], jnp.float32),
        can_dash=jnp.ones((max(n_chars, 1),), bool),
    )

    model_aabb = np.tile(np.array([[[-1, -1, -1], [1, 1, 1]]], np.float32),
                         (max(len(models), 1), 1, 1))
    for mi, lm in enumerate(models):
        if lm.mesh is not None:
            model_aabb[mi, 0] = lm.mesh.verts.min(0)
            model_aabb[mi, 1] = lm.mesh.verts.max(0)

    # entity-following trimesh: only pay for per-env translated collision
    # triangles when some tri-owning entity can actually move — a
    # platform whose active position differs from its load pose
    # (on_pos), or a scene that opts in explicitly
    rest_pos = None
    rest_rot = None
    if tri_ents is not None:
        tri_owner = set(int(x) for x in tri_ents.tolist())
        movable = bool(doc.get("collision_follows_entities", False))
        for ei, _grp, on_pos in platforms:
            if ei in tri_owner and not np.allclose(
                    np.asarray(on_pos, np.float32), np.asarray(st.pos[ei])):
                movable = True
        if movable:
            rest_pos = jnp.asarray(st.pos)
            # "collision_follows_rotation": tri collision rides the FULL
            # entity transform (rotating/animated platforms,
            # physics.c:789-811); plain follows stay translation-only
            if bool(doc.get("collision_follows_rotation", False)):
                rest_rot = jnp.asarray(st.rot)

    cfg = SceneConfig(
        world=world, bodies=bodies, entities=ent, char_params=char_params,
        model_aabb=jnp.asarray(model_aabb),
        limbo_height=jnp.float32(doc.get("limbo_height", 40.0)),
        gravity_y=jnp.float32(-9.8),
        ent_rest_pos=rest_pos,
        ent_rest_rot=rest_rot,
        camera_char=jnp.asarray(
            [int(c.get("character", -1)) for c in cam_entries], jnp.int32)
        if n_cameras else None,
    )
    game = None
    if switches or platforms:
        from ..engine.gamelogic import game_config_empty

        game = game_config_empty(max(len(switches), 1), max_entities)
        for k, (ei, grp, perm) in enumerate(switches):
            game = game._replace(
                switch_entity=game.switch_entity.at[k].set(ei),
                switch_group=game.switch_group.at[k].set(grp),
                switch_permanent=game.switch_permanent.at[k].set(perm),
                switch_valid=game.switch_valid.at[k].set(True),
            )
        for ei, grp, on_pos in platforms:
            game = game._replace(
                platform_group=game.platform_group.at[ei].set(grp),
                platform_on_pos=game.platform_on_pos.at[ei].set(
                    jnp.asarray(on_pos, jnp.float32)),
            )
            # platform groups start OFF: invisible (and, through the
            # visibility→collision coupling, phantom) until a switch
            # turns the group on
            st = st._replace(visible=st.visible.at[ei].set(False))
        game = game._replace(connect_radius=jnp.float32(
            doc.get("connect_radius", 3.0)))

    return LoadedScene(name=doc.get("name", "scene"), cfg=cfg, state0=st,
                       lights=lights, models=models, doc=doc,
                       entity_names=entity_names, game=game,
                       char_entities=char_entities, char_models=char_models,
                       char_heights=char_heights)


def save_scene(scene: LoadedScene) -> str:
    """scene_save (scene.c:1891-1922): re-serialize the retained DOM
    with live entity transforms written back."""
    doc = json.loads(json.dumps(scene.doc))  # deep copy
    ei = 0
    pos = np.asarray(scene.state0.pos)
    for mentry in doc.get("model", []):
        for key in ("entity", "character"):
            for e in mentry.get(key, []):
                if ei < pos.shape[0]:
                    e["position"] = [float(x) for x in pos[ei]]
                ei += 1
    return json.dumps(doc, indent=2)
