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
    ap.add_argument("--dump", default=None, help="save last frame (npy)")
    args = ap.parse_args()

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
                     exit_after=args.exitafter)
    eng = Engine(cfg, tb.cfg, tb.state0, argv=sys.argv[1:])
    eng.run(max_frames=args.frames)
    print("frames:", eng.frame_no, "profiler:", eng.profiler.report())
    cpos = np.asarray(eng.state.phys.pos[0])
    print("character at", cpos.round(2))

    if args.render or args.dump:
        from clap_tpu import mathx as mx
        from clap_tpu.render.camera import camera_update, camera_view_proj
        from clap_tpu.render.lights import lights_empty
        from clap_tpu.render.pipeline import RenderOptions, render_frame
        from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                                 build_render_tables,
                                                 model_from_mesh)
        from clap_tpu.render.ui import osd, ui_compose, ui_layout
        from clap_tpu.scene.primitives import cube

        t = tb.terrain
        models = [
            model_from_mesh(t.vx, t.norm, t.idx.reshape(-1, 3),
                            base_color=(0.35, 0.5, 0.3), with_lods=False),
            model_from_mesh(*_cube_model(0.6, 2.0), base_color=(0.8, 0.5, 0.4)),
            model_from_mesh(*_cube_model(0.8, 0.8), base_color=(0.6, 0.6, 0.7)),
            model_from_mesh(*_cube_model(0.8, 3.0), base_color=(0.4, 0.3, 0.2)),
        ]
        ent = tb.cfg.entities
        rt = build_render_tables(models, np.asarray(ent.model_id),
                                 np.asarray(ent.active))
        st = eng.state
        target = st.phys.pos[0]
        eye, q, dist = camera_update(tb.cfg.world, target,
                                     jnp.float32(-0.35), jnp.float32(0.6),
                                     jnp.float32(10.0))
        view, proj = camera_view_proj(eye, q, jnp.pi / 3, 1280 / 720)
        from clap_tpu.render.view import make_subview

        sv = make_subview(view, proj)
        geom = assemble_scene_geometry(rt, st.mx, st.visible, sv.planes, eye,
                                       skip_culling=ent.skip_culling)
        lights = lights_empty(2)
        d = jnp.array([-0.4, -0.8, -0.4])
        lights = lights._replace(
            direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
            color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
            is_dir=lights.is_dir.at[0].set(True),
            active=lights.active.at[0].set(True))
        opts = RenderOptions(width=1280, height=720, shadow_size=512,
                             film_grain=0.0)
        img = render_frame(opts, geom, view, proj, lights, eye)
        quads = ui_layout([osd("CLAP-TPU TESTBED", text_scale=3)], 1280, 720)
        img = ui_compose(img, quads)
        print("rendered frame:", img.shape,
              "mean", float(img.mean()).__round__(3))
        if args.dump:
            _save_dump(args.dump, img)
            print("saved", args.dump)


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


if __name__ == "__main__":
    main()
