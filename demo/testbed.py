#!/usr/bin/env python
"""Testbed demo — the ldjam56 "onehandclap" analogue
(demo/ldjam56/onehandclap.c): full-feature config, procedural terrain
scene, fuzzer hookup, OSD overlay, optional frame dump.

Usage:
  python demo/testbed.py [-e SECONDS] [--fuzzer] [--render] [--envs N]
                         [--dump out.npy]
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
    ap.add_argument("-e", "--exitafter", type=int, default=0)
    ap.add_argument("--fuzzer", action="store_true")
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--envs", type=int, default=1)
    ap.add_argument("--dump", default=None,
                    help="frame output directory (--render)")
    ap.add_argument("--serve", type=int, default=0, metavar="PORT",
                    help="live browser display on http://127.0.0.1:PORT "
                         "(implies --render; WASD/arrows/space drive it)")
    args = ap.parse_args()
    if args.serve:
        args.render = True

    from clap_tpu.engine.core import ClapConfig, Engine
    from clap_tpu.scene.testbed import build_testbed, replicate_state
    from clap_tpu.engine.step import engine_step
    from clap_tpu.engine.fuzzer import fuzz_batch

    tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                       max_entities=64)

    if args.envs > 1:
        # batched soak run (the 4096-scene configuration)
        sts = replicate_state(tb.state0, args.envs)
        step = jax.jit(jax.vmap(lambda s, i: engine_step(tb.cfg, s, i)))
        key = jax.random.PRNGKey(0)
        import time

        t0 = time.perf_counter()
        for f in range(args.frames):
            ins = fuzz_batch(key, jnp.int32(f), args.envs)
            sts = step(sts, ins)
        jax.block_until_ready(sts)
        dt = time.perf_counter() - t0
        print(f"{args.envs} envs x {args.frames} frames: "
              f"{args.envs * args.frames / dt:.0f} env-steps/s")
        return

    cfg = ClapConfig(title="testbed", fuzzer=args.fuzzer,
                     exit_after=args.exitafter, graphics=args.render,
                     width=640, height=360)

    game_world = session0 = None
    if args.render:
        # full composed game step: 2-character roster, each with its own
        # animated rig (vmapped batch), live particle systems, rendered
        # INSIDE Engine.frame
        from clap_tpu.anim.system import anim_instances_init
        from clap_tpu.engine.game import GameSessionState, GameWorld
        from clap_tpu.engine.gamelogic import (game_config_empty,
                                               game_state_init)
        from clap_tpu.ops.particles import (PARTICLES_MAX, ParticleParams,
                                            particles_init)
        from clap_tpu.scene.testbed import build_demo_rig

        tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                           max_entities=64, n_chars=2)
        sk, lib, acfg = build_demo_rig()
        gcfg = game_config_empty(1, 64)._replace(
            switch_entity=jnp.array([0], jnp.int32),
            switch_valid=jnp.array([True]),
            switch_permanent=jnp.array([True]))
        # spore particles around each character (ldjam57 main.c spores)
        pparams = ParticleParams(
            active=jnp.array([True, True]),
            radius=jnp.array([1.6, 1.6]),
            min_radius=jnp.array([0.4, 0.4]),
            velocity=jnp.array([0.015, 0.015]),
            dist=jnp.array([1, 1], jnp.int32),
            count=jnp.array([PARTICLES_MAX // 4] * 2, jnp.int32))
        pentity = jnp.array([1, 2], jnp.int32)   # character entities
        game_world = GameWorld(scene=tb.cfg, game=gcfg, anim=acfg,
                               anim_sk=sk, anim_lib=lib,
                               particles=pparams, particle_entity=pentity)
        session0 = GameSessionState(
            engine=tb.state0, game=game_state_init(1, 2),
            anim=anim_instances_init(2),
            particles=particles_init(pparams, tb.state0.pos[pentity],
                                     jax.random.PRNGKey(3)),
            # non-None from frame 0 keeps the session treedef stable
            # (None→array would retrace the jitted step at frame 1)
            joint_mats=jnp.tile(jnp.eye(4), (2, 3, 1, 1)))

    eng = Engine(cfg, tb.cfg, tb.state0, argv=sys.argv[1:],
                 game_world=game_world, session0=session0)

    if args.render:
        from clap_tpu.ops.noise import blue_noise2d
        from clap_tpu.render.lights import lights_empty
        from clap_tpu.render.pipeline import RenderOptions, TextureSets
        from clap_tpu.render.scenerender import (build_render_tables,
                                                 default_edge_ids,
                                                 model_from_mesh,
                                                 shadow_static_mask)

        t = tb.terrain
        # procedural texture set (the assets ship textures via glTF —
        # scene/content.py — but the testbed is asset-less): layer 0
        # checker for characters, layer 1 bark for trees
        checker = np.zeros((32, 32, 3), np.float32) + 0.55
        checker[::2, ::2] = (0.95, 0.55, 0.35)
        checker[1::2, 1::2] = (0.95, 0.55, 0.35)
        bark = np.zeros((32, 32, 3), np.float32)
        bark[:] = (0.45, 0.33, 0.2)
        bark[:, ::4] = (0.3, 0.2, 0.12)
        # layer 2: terrain 2×2 atlas — grass quadrant at [0,.5)², rock
        # at +0.5 — blended by slope in the shader (terrain.frag:39-46)
        rng = np.random.default_rng(7)
        atlas = np.zeros((32, 32, 3), np.float32)
        gnoise = rng.uniform(0.85, 1.15, (16, 16, 1)).astype(np.float32)
        atlas[:16, :16] = np.array([0.30, 0.52, 0.22]) * gnoise
        rnoise = rng.uniform(0.8, 1.2, (16, 16, 1)).astype(np.float32)
        atlas[16:, 16:] = np.array([0.45, 0.43, 0.40]) * rnoise
        # fill the two unused quadrants with each tile's tone so the
        # wrap-bilinear fetch at quadrant edges doesn't bleed black
        # gridlines into the tiled terrain
        atlas[:16, 16:] = atlas[:16, :16]
        atlas[16:, :16] = atlas[16:, 16:]
        textures = TextureSets(
            diffuse=jnp.asarray(np.stack([checker, bark, atlas])),
            slope_blend=jnp.array([False, False, True]))

        # SKINNED textured characters: the ring-column mesh deforms by
        # the rigs' LBS every frame (model.vert:34-48; charskin.py)
        from clap_tpu.scene.testbed import (build_testbed_char_skin,
                                            char_column_mesh)

        chv, chn, chuv, chf = char_column_mesh(0.6, 2.0)
        models = [
            model_from_mesh(t.vx, t.norm, t.idx.reshape(-1, 3),
                            base_color=(1.0, 1.0, 1.0), with_lods=False,
                            uv=t.uv, tex_id=2),
            model_from_mesh(chv, chn, chf,
                            base_color=(0.8, 0.5, 0.4),
                            uv=chuv, tex_id=0),
            model_from_mesh(*_cube_model(0.8, 0.8),
                            base_color=(0.6, 0.6, 0.7)),
            model_from_mesh(*_cube_model(0.8, 3.0),
                            base_color=(0.4, 0.3, 0.2),
                            uv=_cube_uv(), tex_id=1),
        ]
        ent = tb.cfg.entities
        edge = default_edge_ids(np.asarray(ent.active),
                                np.asarray(ent.body_is_char))
        # terrain/trees bake their shadows once (static split);
        # per-frame CSM rasters only characters + dynamic cubes
        rt = build_render_tables(models, np.asarray(ent.model_id),
                                 np.asarray(ent.active),
                                 entity_edge_id=edge,
                                 entity_shadow_static=shadow_static_mask(ent))
        lights = lights_empty(1)
        d = jnp.array([-0.4, -0.8, -0.4])
        lights = lights._replace(
            direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
            color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
            is_dir=lights.is_dir.at[0].set(True),
            active=lights.active.at[0].set(True))
        cskin = build_testbed_char_skin(tb, models, rt)
        opts = RenderOptions(width=640, height=360, shadow_size=256)
        eng.attach_graphics(rt, lights, opts,
                            skip_culling=ent.skip_culling,
                            out_dir=args.dump or "/tmp/testbed_frames",
                            textures=textures,
                            grain_noise=blue_noise2d(64),
                            particle_world=game_world.particles,
                            particle_size=0.1,
                            particle_color=(0.95, 0.9, 0.5),
                            char_skin=cskin)

    if args.serve:
        d = eng.attach_display(port=args.serve)
        print(f"display: http://{d.host}:{d.port}/  (ctrl-c to stop)")

    eng.run(max_frames=args.frames)
    print("frames:", eng.frame_no, "profiler:", eng.profiler.report())
    if args.render and eng.last_frame is not None:
        print("last frame:", tuple(eng.last_frame.shape),
              "mean", round(float(eng.last_frame.mean()), 3))
        if game_world is not None:
            jm = np.asarray(eng.session.joint_mats)
            print("rigs animating:", jm.shape[0],
                  "poses differ from bind:",
                  bool((np.abs(jm - np.eye(4)) > 1e-3).any()))
    cpos = np.asarray(eng.state.phys.pos[0])
    print("character at", cpos.round(2))

def _save_dump(path, img):
    import numpy as np

    if str(path).endswith(".png"):
        from clap_tpu.utils.png import save_png

        save_png(path, np.asarray(img))
    else:
        np.save(path, np.asarray(img))


def _cube_model(w, h):
    from clap_tpu.scene.primitives import cube

    v, n, uv, f = cube(1.0)
    v = v * np.array([w, h, w], np.float32) + np.array([0, h / 2, 0], np.float32)
    return v, n, f


def _cube_uv():
    from clap_tpu.scene.primitives import cube

    return np.asarray(cube(1.0)[2], np.float32)


if __name__ == "__main__":
    main()
