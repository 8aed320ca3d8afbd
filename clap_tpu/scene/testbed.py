"""Benchmark testbed scene builder (the ldjam56 "onehandclap" analogue).

The reference demo loads scene.json + glTF assets (demo/ldjam56); the
asset submodules are not in-tree (SURVEY §6), so the benchmark scene is
reconstructed procedurally per SURVEY's guidance: the fully in-tree
terrain pipeline (terrain.c:418-574) + a kinematic character capsule +
dynamic bodies + instantiator-placed static entities (trees).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..char.controller import CharParams, char_state_init
from ..engine.state import (EngineState, EntityParams, SceneConfig,
                            engine_state_init)
from ..physics.heightfield import heightfield_from_terrain
from ..physics.narrowphase import make_world
from ..physics.world import (BodyParams, body_params_empty, capsule_auto_size,
                             finalize_inertia, phys_state_init)
from ..utils.frand import Rand48
from .terrain import terrain_init_square_landscape


class Testbed(NamedTuple):
    cfg: SceneConfig
    state0: EngineState
    terrain: object
    chunks: list = None     # [(verts, normals, faces)] terrain chunks


def chunk_terrain(t, grid: int = 4) -> list:
    """Split the terrain mesh into grid² independent chunks by face
    centroid — each becomes its own entity so frustum culling and
    distance LOD actually apply to terrain (the monolithic mesh always
    drew ALL its faces: skip_culling + one LOD for the entity the
    camera stands on)."""
    v = np.asarray(t.vx, np.float32)
    n = np.asarray(t.norm, np.float32)
    f = np.asarray(t.idx, np.int64).reshape(-1, 3)
    cent = v[f].mean(axis=1)
    x0, x1 = v[:, 0].min(), v[:, 0].max()
    z0, z1 = v[:, 2].min(), v[:, 2].max()
    ix = np.clip(((cent[:, 0] - x0) / max(x1 - x0, 1e-6) * grid)
                 .astype(np.int64), 0, grid - 1)
    iz = np.clip(((cent[:, 2] - z0) / max(z1 - z0, 1e-6) * grid)
                 .astype(np.int64), 0, grid - 1)
    cid = ix * grid + iz
    out = []
    for c in range(grid * grid):
        fc = f[cid == c]
        if len(fc) == 0:
            continue
        un, inv = np.unique(fc.reshape(-1), return_inverse=True)
        out.append((v[un], n[un], inv.reshape(-1, 3).astype(np.uint32)))
    return out


def build_testbed(seed: int = 42, side: float = 64.0, nr_v: int = 128,
                  n_dynamic: int = 8, max_entities: int = 64,
                  char_aabb=(0.6, 2.0, 0.6), n_chars: int = 1,
                  terrain_chunks: int = 0) -> Testbed:
    """Build the scene on host, upload as device constants + initial state.

    ``n_chars > 1`` builds a roster of characters (ldjam57-style: the
    player switches between them, main.c:140-245); they spawn in a line
    along +x, 3 units apart, each with its own kinematic capsule.

    ``terrain_chunks = G`` splits the terrain into G×G chunk ENTITIES
    (model ids 4..) so the render path culls and LODs terrain per
    chunk; entity 0 stays the gameplay/collision terrain but renders
    nothing (its model is empty)."""
    t = terrain_init_square_landscape(seed, -side / 2, 0.0, -side / 2,
                                      side, nr_v)
    hf = heightfield_from_terrain(t)
    world = make_world(hf)

    n_bodies = n_chars + n_dynamic
    bodies = body_params_empty(n_bodies)

    # character capsules (slots [0, n_chars))
    r, hl, yoff, ray_off = capsule_auto_size(*char_aabb)
    def setb(arr, i, v):
        return arr.at[i].set(v)

    for ci in range(n_chars):
        bodies = bodies._replace(
            active=setb(bodies.active, ci, True),
            kinematic=setb(bodies.kinematic, ci, True),
            radius=setb(bodies.radius, ci, r),
            half_len=setb(bodies.half_len, ci, hl),
            yoffset=setb(bodies.yoffset, ci, yoff),
            ray_off=setb(bodies.ray_off, ci, ray_off),
            mass=setb(bodies.mass, ci, 70.0),
        )

    # dynamic spheres scattered above the terrain
    rng = Rand48(seed ^ 0x5EED)
    dyn_pos = []
    for i in range(n_dynamic):
        bi = n_chars + i
        br = 0.3 + 0.2 * rng.drand48()
        bx = (rng.drand48() - 0.5) * side * 0.8
        bz = (rng.drand48() - 0.5) * side * 0.8
        bodies = bodies._replace(
            active=setb(bodies.active, bi, True),
            radius=setb(bodies.radius, bi, br),
            yoffset=setb(bodies.yoffset, bi, br),
            ray_off=setb(bodies.ray_off, bi, br),
            mass=setb(bodies.mass, bi, 1.0 + rng.drand48()),
            bounce=setb(bodies.bounce, bi, 0.3),
            bounce_vel=setb(bodies.bounce_vel, bi, 0.1),
        )
        dyn_pos.append((bx, 4.0 + 3.0 * rng.drand48(), bz))

    bodies = finalize_inertia(bodies)

    char_params = CharParams(
        body=jnp.arange(n_chars, dtype=jnp.int32),
        lin_speed=jnp.full((n_chars,), char_aabb[1] * 1.2, jnp.float32),
        jump_forward=jnp.full((n_chars,), 1.2, jnp.float32),
        jump_upward=jnp.full((n_chars,), 5.0, jnp.float32),
        can_dash=jnp.ones((n_chars,), bool),
    )

    # entities: 0 = terrain, [1, 1+n_chars) = characters,
    # then n_dynamic spheres, then instantiator trees
    E = max_entities
    ent = EntityParams(
        active=jnp.zeros((E,), bool),
        model_id=jnp.zeros((E,), jnp.int32),
        body=jnp.full((E,), -1, jnp.int32),
        body_is_char=jnp.zeros((E,), bool),
        yoffset=jnp.zeros((E,), jnp.float32),
        parent=jnp.full((E,), -1, jnp.int32),
        skip_culling=jnp.zeros((E,), bool),
    )
    ent = ent._replace(
        active=ent.active.at[0].set(True),
        skip_culling=ent.skip_culling.at[0].set(True),  # terrain
    )
    for ci in range(n_chars):
        ent = ent._replace(
            active=ent.active.at[1 + ci].set(True),
            model_id=ent.model_id.at[1 + ci].set(1),
            body=ent.body.at[1 + ci].set(ci),
            body_is_char=ent.body_is_char.at[1 + ci].set(True),
        )
    for i in range(n_dynamic):
        ei = 1 + n_chars + i
        ent = ent._replace(
            active=ent.active.at[ei].set(True),
            model_id=ent.model_id.at[ei].set(2),
            body=ent.body.at[ei].set(n_chars + i),
        )
    tree_pos = []
    next_ei = 1 + n_chars + n_dynamic
    # reserve entity slots for the terrain chunks: trees otherwise fill
    # every slot and the chunk loop below keeps ZERO chunks — terrain
    # silently falls back to the monolithic no-cull/no-LOD model (this
    # bit the composed bench: terrain_chunks=4 with max_entities=96
    # rendered 32k un-culled LOD0 terrain faces every env)
    tree_cap = E - terrain_chunks * terrain_chunks
    for k, (name, dx, dy, dz) in enumerate(t.instantiators):
        ei = next_ei
        if ei >= tree_cap:
            break
        ent = ent._replace(
            active=ent.active.at[ei].set(True),
            model_id=ent.model_id.at[ei].set(3),
        )
        tree_pos.append((ei, (dx, dy, dz)))
        next_ei += 1

    aabb_rows = [
        [[-side / 2, -10, -side / 2], [side / 2, 10, side / 2]],  # terrain
        [[-0.3, 0.0, -0.3], [0.3, 2.0, 0.3]],                     # character
        [[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]],                    # sphere
        [[-0.5, 0.0, -0.5], [0.5, 3.0, 0.5]],                     # tree
    ]
    chunks = None
    if terrain_chunks:
        chunks = chunk_terrain(t, terrain_chunks)
        kept = []
        for c, (cv, _cn, _cf) in enumerate(chunks):
            ei = next_ei
            if ei >= E:
                break            # capacity bound: drop remaining chunks
            ent = ent._replace(
                active=ent.active.at[ei].set(True),
                model_id=ent.model_id.at[ei].set(4 + c),
            )
            aabb_rows.append([cv.min(0).tolist(), cv.max(0).tolist()])
            kept.append(chunks[c])
            next_ei += 1
        chunks = kept

    model_aabb = jnp.array(aabb_rows, jnp.float32)

    cfg = SceneConfig(
        world=world, bodies=bodies, entities=ent, char_params=char_params,
        model_aabb=model_aabb, limbo_height=jnp.float32(40.0),
        gravity_y=jnp.float32(-9.8),
    )

    # initial state
    st = engine_state_init(E, n_bodies, n_chars)
    # character spawns at terrain center, on the ground
    from .terrain import terrain_height_np

    for ci in range(n_chars):
        cx = 3.0 * ci
        cy = float(terrain_height_np(t, cx, 0.0))
        st = st._replace(
            phys=st.phys._replace(
                pos=st.phys.pos.at[ci].set(jnp.array([cx, cy + yoff, 0.0]))
            )
        )
    for i, p in enumerate(dyn_pos):
        st = st._replace(
            phys=st.phys._replace(
                pos=st.phys.pos.at[n_chars + i].set(jnp.array(p, jnp.float32))
            )
        )
    st = st._replace(visible=ent.active)
    for ei, (dx, dy, dz) in tree_pos:
        st = st._replace(pos=st.pos.at[ei].set(jnp.array([dx, dy, dz], jnp.float32)))
    return Testbed(cfg=cfg, state0=st, terrain=t, chunks=chunks)


def char_column_mesh(width: float = 0.6, height: float = 2.0,
                     rings: int = 13, segments: int = 10):
    """Skinnable character mesh: a ring column along +y (feet at 0,
    head at ``height``) with a waist/shoulder radius profile — the
    asset-less stand-in for the glTF character meshes (the reference's
    demo chars; absent submodules, SURVEY §6). Ring density is what
    makes LBS deformation visible: the cube proxy had no interior
    vertices to bend. Returns (verts, normals, uvs, faces) — uv is a
    cylindrical unwrap (u = angle/2π, v = y/height)."""
    ys = np.linspace(0.0, height, rings).astype(np.float32)
    tn = ys / height
    # radius profile: ankles → hips bulge → waist → shoulders → head
    prof = 0.22 + 0.16 * np.exp(-((tn - 0.35) / 0.25) ** 2) \
        + 0.10 * np.exp(-((tn - 0.8) / 0.18) ** 2) \
        - 0.06 * tn
    prof = (prof * (width / 0.6)).astype(np.float32)
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ca, sa = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
    verts, normals, uvs = [], [], []
    for yi, r in zip(ys, prof):
        for k, (c, s) in enumerate(zip(ca, sa)):
            verts.append((r * c, yi, r * s))
            normals.append((c, 0.0, s))
            uvs.append((k / segments, yi / height))
    verts = np.asarray(verts, np.float32)
    normals = np.asarray(normals, np.float32)
    faces = []
    for k in range(rings - 1):
        for i in range(segments):
            j = (i + 1) % segments
            a, b = k * segments + i, k * segments + j
            c, d = a + segments, b + segments
            faces.extend([[a, c, b], [b, c, d]])
    # cap fans (feet / head)
    base = len(verts)
    verts = np.concatenate([verts, np.array(
        [[0, 0, 0], [0, height, 0]], np.float32)])
    normals = np.concatenate([normals, np.array(
        [[0, -1, 0], [0, 1, 0]], np.float32)])
    top0 = (rings - 1) * segments
    for i in range(segments):
        j = (i + 1) % segments
        faces.append([base, i, j])                       # bottom
        faces.append([base + 1, top0 + j, top0 + i])     # top
    uvs = np.concatenate([np.asarray(uvs, np.float32),
                          np.array([[0.5, 0.0], [0.5, 1.0]], np.float32)])
    return verts, normals, uvs, np.asarray(faces, np.int32)


def build_testbed_char_skin(tb: Testbed, models, rt):
    """CharSkin for the testbed roster: smooth 1-D weights to the demo
    rig's 3-joint chain (joints at y = 0, 0.8, 1.6 — build_demo_rig),
    shared by every char entity (slots 1..n_chars)."""
    from ..render.charskin import build_char_skin, linear_joint_weights

    n_chars = tb.cfg.char_params.body.shape[0]
    w, ji = linear_joint_weights(models[1].verts,
                                 np.array([0.0, 0.8, 1.6]))
    return build_char_skin(rt, models[1], w, ji, 3,
                           np.arange(1, 1 + n_chars))


def testbed_models(tb: Testbed, with_lods: bool = True,
                   terrain_color=(0.35, 0.5, 0.3),
                   skinned_chars: bool = False,
                   textured: bool = False):
    """ModelData list matching the testbed's model-id layout (render
    side of models_render): 0 terrain (EMPTY when chunked), 1 character,
    2 sphere, 3 tree, then one model per terrain chunk with LOD chains.

    skinned_chars=True swaps the character's cube proxy for the
    skinnable ring-column mesh (char_column_mesh) — pair with
    build_testbed_char_skin for LBS-deformed rendering.

    textured=True puts uv + texture layers on the character (layer 0)
    and tree (layer 1) models — pair with testbed_textures() — which
    makes the tables material-bearing: the composed frame then takes
    the per-pixel gather path (model.frag:32-80 sampling), NOT the
    flat-material kernel_attrs fast path."""
    from ..render.scenerender import ModelData, model_from_mesh
    from .primitives import cube

    t = tb.terrain
    cv, cn, cu, cf = cube(1.0)
    cv = np.asarray(cv, np.float32)
    cn = np.asarray(cn, np.float32)
    cu = np.asarray(cu, np.float32)
    cf = np.asarray(cf)

    def cube_model(w, h, color, tex_id: int = -1):
        v = cv * np.array([w, h, w], np.float32) \
            + np.array([0, h / 2, 0], np.float32)
        return model_from_mesh(v, cn, cf, base_color=color,
                               with_lods=with_lods,
                               uv=cu if tex_id >= 0 else None,
                               tex_id=tex_id)

    if tb.chunks:
        z3 = np.zeros((0, 3), np.float32)
        terrain_model = ModelData(
            verts=z3, normals=z3, base_color=z3,
            rough_metal=np.zeros((0, 2), np.float32), emission=z3,
            lod_faces=[np.zeros((0, 3), np.uint32)])
    else:
        terrain_model = model_from_mesh(
            t.vx, t.norm, t.idx.reshape(-1, 3),
            base_color=terrain_color, with_lods=False)
    if skinned_chars:
        sv, sn, suv, sf = char_column_mesh(0.6, 2.0)
        char_model = model_from_mesh(
            sv, sn, sf, base_color=(0.8, 0.5, 0.4), with_lods=with_lods,
            uv=suv if textured else None, tex_id=0 if textured else -1)
    else:
        char_model = cube_model(0.6, 2.0, (0.8, 0.5, 0.4),
                                tex_id=0 if textured else -1)
    models = [
        terrain_model,
        char_model,
        cube_model(0.8, 0.8, (0.6, 0.6, 0.7)),
        cube_model(0.8, 3.0, (0.4, 0.3, 0.2),
                   tex_id=1 if textured else -1),
    ]
    for cvv, cnn, cff in (tb.chunks or []):
        models.append(model_from_mesh(cvv, cnn, cff,
                                      base_color=terrain_color,
                                      with_lods=with_lods))
    return models


def testbed_textures():
    """Procedural TextureSets for testbed_models(textured=True): layer 0
    checker (characters), layer 1 bark stripes (trees) — the asset-less
    stand-in for glTF-shipped textures (scene/content.py loads real
    ones)."""
    from ..render.pipeline import TextureSets

    checker = np.zeros((32, 32, 3), np.float32) + 0.55
    checker[::2, ::2] = (0.95, 0.55, 0.35)
    checker[1::2, 1::2] = (0.95, 0.55, 0.35)
    bark = np.zeros((32, 32, 3), np.float32)
    bark[:] = (0.45, 0.33, 0.2)
    bark[:, ::4] = (0.3, 0.2, 0.12)
    return TextureSets(diffuse=jnp.asarray(np.stack([checker, bark])))


def replicate_state(st: EngineState, n_envs: int) -> EngineState:
    """Broadcast one initial state to an env batch."""
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), st)


def build_demo_rig():
    """Small procedural character rig + clips for asset-less demos (the
    reference ships glTF rigs in the absent asset submodules; this
    stands in so every character can animate: a 3-joint chain with
    looping idle/motion/jump/fall clips). Returns (skeleton, library,
    AnimConfig)."""
    from ..anim.clips import PATH_ROTATION, build_library
    from ..anim.joints import build_skeleton
    from ..anim.system import default_state_map

    parent = [-1, 0, 1]
    # inverse bind = inverse of each joint's rest GLOBAL transform
    # (gltf skins' inverseBindMatrices) so the rest pose skins to
    # identity — joints sit at y = 0, 0.8, 1.6 on the chain
    invbind = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    for j, y in enumerate((0.0, 0.8, 1.6)):
        invbind[j, 1, 3] = -y
    base_t = np.array([[0, 0, 0], [0, 0.8, 0], [0, 0.8, 0]], np.float32)
    base_r = np.tile(np.array([0, 0, 0, 1], np.float32), (3, 1))
    base_s = np.ones((3, 3), np.float32)
    sk = build_skeleton(parent, invbind, base_t, base_r, base_s)

    keys = np.linspace(0.0, 1.0, 8).astype(np.float32)

    def swing(amp, phase=0.0):
        ang = amp * np.sin(2 * np.pi * keys + phase)
        q = np.stack([np.sin(ang / 2), np.zeros_like(ang),
                      np.zeros_like(ang), np.cos(ang / 2)], -1)
        return q.astype(np.float32)

    clips = []
    for amp in (0.1, 0.6, 0.9, 0.4):   # idle, motion, jump, fall
        clips.append([(1, PATH_ROTATION, keys, swing(amp)),
                      (2, PATH_ROTATION, keys, swing(amp, np.pi / 2))])
    lib = build_library(clips, 3)
    acfg = default_state_map(["idle", "motion", "jump", "fall"])
    return sk, lib, acfg
