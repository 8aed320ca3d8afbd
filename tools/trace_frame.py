#!/usr/bin/env python
"""Device-trace one full 720p frame (the bench_full_frame workload,
optionally the 100k-tri big scene) and aggregate op time by source
line. Usage: python tools/trace_frame.py [--big]
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

from clap_tpu import mathx as mx
from clap_tpu.render.lights import lights_empty
from clap_tpu.render.pipeline import RenderOptions, SceneGeometry, render_frame
from clap_tpu.render.raster import cluster_faces
from clap_tpu.scene.terrain import terrain_init_square_landscape

width, height = 1280, 720
if "--big" in sys.argv:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from raster_sweep import big_scene

    v_np, f_np = big_scene()
    verts = jnp.asarray(v_np)
    faces = jnp.asarray(f_np)
    nrm = np.zeros_like(v_np)
    nrm[:, 1] = 1.0
    normals = jnp.asarray(nrm)
else:
    t = terrain_init_square_landscape(3, -32.0, 0.0, -32.0, 64.0, 96)
    verts = jnp.asarray(t.vx)
    normals = jnp.asarray(t.norm)
    faces = jnp.asarray(cluster_faces(t.vx, t.idx.reshape(-1, 3))[0])
V = verts.shape[0]
print("tris:", faces.shape[0])
geom = SceneGeometry(
    verts=verts, normals=normals, faces=faces,
    face_valid=jnp.ones((faces.shape[0],), bool),
    base_color=jnp.full((V, 3), 0.45),
    rough_metal=jnp.tile(jnp.array([[0.8, 0.0]]), (V, 1)),
    emission=jnp.zeros((V, 3)),
)
opts = RenderOptions(width=width, height=height, shadow_size=512,
                     film_grain=0.0)
eye = jnp.array([0.0, 18.0, 28.0])
view = mx.mat4_look_at(eye, jnp.array([0.0, 2.0, 0.0]),
                       jnp.array([0.0, 1.0, 0.0]))
proj = mx.mat4_perspective(jnp.pi / 3, width / height, 0.1, 200.0)
lights = lights_empty(2)
d = jnp.array([-0.4, -0.8, -0.4])
lights = lights._replace(
    direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
    color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
    is_dir=lights.is_dir.at[0].set(True),
    active=lights.active.at[0].set(True),
)
frame = jax.jit(lambda g, v, p, e: render_frame(opts, g, v, p, lights, e))
img = frame(geom, view, proj, eye)
jax.block_until_ready(img)
print("warm; tracing...", flush=True)
trace_dir = "/tmp/frame_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        img = frame(geom, view, proj, eye)
    jax.block_until_ready(img)

paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
by_src = defaultdict(float)
by_name = defaultdict(float)
total = 0.0
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if ("TPU" in nm or "Device" in nm) and "Host" not in nm:
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        nm = ev.get("name", "")
        if nm.startswith("jit_") or nm.startswith("Module"):
            continue
        src = (ev.get("args", {}) or {}).get("source", "") or nm[:50]
        by_src[src] += ev.get("dur", 0.0)
        by_name[nm.split(".")[0][:40]] += ev.get("dur", 0.0)
        total += ev.get("dur", 0.0)
print(f"\ntotal device op time: {total / 3e3:.1f} ms/frame")
print("--- by source line ---")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{v / 3e3:9.2f} ms  {k}")
print("--- by op family ---")
for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{v / 3e3:9.2f} ms  {k}")
