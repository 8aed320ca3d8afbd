#!/usr/bin/env python
"""Device-trace the composed step+render program and aggregate device
op time by HLO source line (the profiling workflow from ROUND_NOTES:
jax.profiler.trace -> parse the .trace.json.gz device track).

Usage: python tools/trace_composed.py [n_envs] [res]
Prints the top source lines by total device time.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_traceback_in_locations_limit", -1)

from clap_tpu import mathx as mx
from clap_tpu.anim.system import anim_instances_init
from clap_tpu.engine.game import GameSessionState, GameWorld, game_step
from clap_tpu.engine.gamelogic import game_config_empty, game_state_init
from clap_tpu.engine.step import inputs_zero
from clap_tpu.render.camera import camera_view_proj
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import (RenderOptions,
                                      render_frame_dynamic_batch)
from clap_tpu.render.scenerender import (assemble_cluster_records_batch,
                                         assemble_scene_geometry_batch,
                                         bake_static_shadow,
                                         build_render_tables,
                                         default_edge_ids, kernel_attrs_ok,
                                         shadow_static_mask)
from clap_tpu.render.view import make_subview
from clap_tpu.scene.testbed import (build_demo_rig, build_testbed,
                                    testbed_models)

n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

n_chars = 2
tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                   max_entities=96, n_chars=n_chars, terrain_chunks=4)
sk, lib, acfg = build_demo_rig()
gcfg = game_config_empty(1, 96)._replace(
    switch_entity=jnp.array([0], jnp.int32),
    switch_valid=jnp.array([True]),
    switch_permanent=jnp.array([True]))
gw = GameWorld(scene=tb.cfg, game=gcfg, anim=acfg, anim_sk=sk, anim_lib=lib)
gs1 = GameSessionState(engine=tb.state0, game=game_state_init(1, n_chars),
                       anim=anim_instances_init(n_chars),
                       joint_mats=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                           (n_chars, 3, 1, 1)))

skin_on = bool(int(os.environ.get("SKIN", "1")))
models = testbed_models(tb, skinned_chars=skin_on)
ent = tb.cfg.entities
edge = default_edge_ids(np.asarray(ent.active), np.asarray(ent.body_is_char))
static_on = bool(int(os.environ.get("STATIC_SHADOW", "1")))
rt = build_render_tables(
    models, np.asarray(ent.model_id), np.asarray(ent.active),
    entity_edge_id=edge,
    entity_shadow_static=shadow_static_mask(ent) if static_on else None)
cskin = None
if skin_on:
    from clap_tpu.scene.testbed import build_testbed_char_skin

    cskin = build_testbed_char_skin(tb, models, rt)
lights = lights_empty(1)
d = jnp.array([-0.4, -0.8, -0.4])
lights = lights._replace(
    direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
    color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
    is_dir=lights.is_dir.at[0].set(True),
    active=lights.active.at[0].set(True))
opts = RenderOptions(width=res, height=res, shadow_size=256, film_grain=0.0,
                     record_compact=12288,
                     attr_bf16=bool(int(os.environ.get("ATTR_BF16", "0"))),
                     kernel_attrs=kernel_attrs_ok(rt) and bool(
                         int(os.environ.get("KERNEL_ATTRS", "1"))))
static_shadow = None
if static_on and rt.static_shadow_faces is not None \
        and rt.static_shadow_faces.shape[0] > 0:
    static_shadow = bake_static_shadow(rt, tb.state0.mx,
                                       lights.direction[0],
                                       shadow_size=1024, far=200.0)
print("kernel_attrs:", opts.kernel_attrs,
      "static_shadow:", static_shadow is not None, flush=True)
proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)
skip = ent.skip_culling


def views_planes(sts):
    cam = sts.camera

    def view_of(c):
        q = mx.qmul(
            mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), c.yaw),
            mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), c.pitch))
        return camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]

    views = jax.vmap(view_of)(cam)
    planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
    return views, planes


cluster_rec = (opts.kernel_attrs and rt.cl_rest is not None
               and bool(int(os.environ.get("CLUSTER_REC", "1"))))
print("cluster_rec:", cluster_rec, flush=True)


@jax.jit
def f_full(gss, ins):
    gss = jax.vmap(lambda s, i: game_step(gw, s, i))(gss, ins)
    sts = gss.engine
    views, planes = views_planes(sts)
    if cluster_rec:
        geom, axes = assemble_cluster_records_batch(
            rt, sts.mx, sts.visible, planes, sts.camera.pos, views, proj,
            cap=opts.record_compact, skip_culling=skip,
            char_skin=cskin, joint_mats=gss.joint_mats)
    else:
        geom, axes = assemble_scene_geometry_batch(
            rt, sts.mx, sts.visible, planes, sts.camera.pos,
            skip_culling=skip, char_skin=cskin,
            joint_mats=gss.joint_mats)
    imgs = render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                      lights, sts.camera.pos, far=200.0,
                                      static_shadow=static_shadow)
    return gss, jnp.mean(imgs, axis=(1, 2, 3))


gss = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), gs1)
ins1 = inputs_zero(n_chars)._replace(
    motion=jnp.zeros((n_chars, 2), jnp.float32).at[0, 0].set(1.0))
ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), ins1)

gss2, luma = f_full(gss, ins)
jax.block_until_ready(luma)
print("warm; tracing...", flush=True)

trace_dir = "/tmp/composed_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        gss2, luma = f_full(gss2, ins)
    jax.block_until_ready(luma)

paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths)
ev_by_src = defaultdict(float)
ev_by_name = defaultdict(float)
total = 0.0
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    # find device-track pids (TPU/device hardware tracks, not host threads)
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if ("TPU" in nm or "Device" in nm or "/device:" in nm) \
                    and "Host" not in nm:
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        args = ev.get("args", {}) or {}
        # skip the top-level module event (it spans everything)
        nm = ev.get("name", "")
        if nm.startswith("jit_") or nm.startswith("Module"):
            continue
        dur = ev.get("dur", 0.0)
        src = args.get("source", "") or args.get("source_info", "")
        key = src if src else nm[:60]
        ev_by_src[key] += dur
        ev_by_name[nm.split(".")[0][:40]] += dur
        total += dur

print(f"\ntotal device op time: {total / 1e3 / 3:.1f} ms/frame "
      f"({n_envs} envs @ {res})")
print("\n--- by source line ---")
for k, v in sorted(ev_by_src.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{v / 1e3 / 3:9.2f} ms  {k}")
print("\n--- by op family ---")
for k, v in sorted(ev_by_name.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{v / 1e3 / 3:9.2f} ms  {k}")
