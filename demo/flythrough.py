#!/usr/bin/env python
"""Render a camera flythrough of the testbed to PNG frames — the
screenshot/video-capture role of the reference's debug tooling.

Usage: python demo/flythrough.py [--frames 8] [--out /tmp/fly]
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
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="/tmp/fly")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--sim-frames", type=int, default=20)
    args = ap.parse_args()

    from clap_tpu import mathx as mx
    from clap_tpu.engine.step import engine_step, inputs_zero
    from clap_tpu.render.camera import camera_update, camera_view_proj
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import RenderOptions, render_frame
    from clap_tpu.render.scenerender import (assemble_scene_geometry,
                                             build_render_tables,
                                             model_from_mesh)
    from clap_tpu.render.view import make_subview
    from clap_tpu.scene.testbed import build_testbed
    from clap_tpu.utils.png import save_png
    from clap_tpu.scene.primitives import cube

    tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                       max_entities=64)

    def cube_model(w, h, color):
        v, n, uv, f = cube(1.0)
        v = v * np.array([w, h, w], np.float32) + np.array([0, h / 2, 0],
                                                           np.float32)
        return model_from_mesh(v, n, f, base_color=color, with_lods=False)

    t = tb.terrain
    models = [
        model_from_mesh(t.vx, t.norm, t.idx.reshape(-1, 3),
                        base_color=(0.35, 0.5, 0.3), with_lods=False),
        cube_model(0.6, 2.0, (0.8, 0.5, 0.4)),
        cube_model(0.8, 0.8, (0.6, 0.6, 0.7)),
        cube_model(0.8, 3.0, (0.4, 0.3, 0.2)),
    ]
    ent = tb.cfg.entities
    rt = build_render_tables(models, np.asarray(ent.model_id),
                             np.asarray(ent.active))
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    opts = RenderOptions(width=args.width, height=args.height,
                         shadow_size=256, film_grain=0.0)

    step = jax.jit(lambda s, i: engine_step(tb.cfg, s, i))

    @jax.jit
    def render(st_mx, st_vis, yaw, target):
        eye, q, dist = camera_update(tb.cfg.world, target,
                                     jnp.float32(-0.35), yaw,
                                     jnp.float32(12.0))
        view, proj = camera_view_proj(eye, q, jnp.pi / 3,
                                      args.width / args.height)
        sv = make_subview(view, proj)
        geom = assemble_scene_geometry(rt, st_mx, st_vis, sv.planes, eye,
                                       skip_culling=ent.skip_culling)
        return render_frame(opts, geom, view, proj, lights, eye)

    Path(args.out).mkdir(parents=True, exist_ok=True)
    st = tb.state0
    ins = inputs_zero(1)._replace(motion=jnp.array([[0.7, 0.3]], jnp.float32))
    for f in range(args.frames):
        for _ in range(args.sim_frames):
            st = step(st, ins)
        yaw = jnp.float32(2 * np.pi * f / args.frames)
        img = render(st.mx, st.visible, yaw, st.phys.pos[0])
        p = f"{args.out}/frame_{f:03d}.png"
        save_png(p, np.asarray(img))
        print("wrote", p)


if __name__ == "__main__":
    main()
