#!/usr/bin/env python
"""Benchmark driver — prints the north-star metric as a JSON line.

North star (BASELINE.json): batched sim-steps/sec/chip for 4096 parallel
testbed scenes; target 4096 envs × 60 Hz = 245,760 env-steps/s → 1.0
vs_baseline. Sub-benchmarks cover the BASELINE.json configs; they're
reported in the "sub" field.

Survivability (VERDICT r4 #1 — BENCH_r04 was rc=124/parsed=null because
one JSON line printed only after ~15 heavyweight configs):

- configs run cheapest/most-important FIRST (the headline headless
  number lands within the first minutes, even on a cold compile cache);
- each config runs in its OWN SUBPROCESS (`bench.py --config KEY`) with
  a per-config timeout: Python defers signal handlers while the main
  thread is inside a single multi-minute XLA compile (measured on this
  box), so an in-process design cannot react to SIGTERM mid-compile —
  the parent, by contrast, only ever waits on the child and stays
  signal-deliverable; a runaway compile is killed at its deadline and
  recorded as {"skipped": "config-timeout"} instead of eating the run;
- the merged JSON line is RE-printed after every completed config, so
  the last parseable line of stdout is always the freshest snapshot —
  a mid-run kill still leaves a valid artifact in the tail;
- a wall-clock governor (BENCH_BUDGET_S, default 4800 s) skips any
  config whose cost estimate exceeds the remaining budget;
- SIGTERM/SIGINT/atexit handlers emit the merged line one final time
  (`timeout` sends SIGTERM — r4's killer — which is catchable);
- every snapshot is also mirrored to BENCH_PARTIAL.json on disk.

Runs on whatever jax.default_backend() is (the driver provides a real
TPU chip); falls back gracefully if a config fails.
"""
import atexit
import json
import os
import signal
import sys
import time

import jax

# persistent compilation cache: the graphs here are large and the remote
# TPU compile is slow — cache across processes so repeat runs are fast
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CLAP_TPU_COMP_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.block_until_ready(x)
    return x


def bench_ca2d():
    """Config #1: ca2d 256², fixed rule, 1000 steps (one grid)."""
    from clap_tpu.ops.ca2d import CA_TEST, ca2d_run_pallas, ca2d_seed

    key = jax.random.PRNGKey(0)
    grid = ca2d_seed(CA_TEST, key, (256, 256))
    run = lambda g: ca2d_run_pallas(CA_TEST, g, 1000)
    _sync(run(grid))  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = run(grid)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": "ca2d_256_1000steps_ms", "value": dt * 1e3,
            "cell_steps_per_s": 256 * 256 * 1000 / dt}


def bench_skinning(n_inst: int = 1024, n_joints: int = 64, n_verts: int = 4096):
    """Config #3: pose sampling + blend + skinning, 1024 instances.

    Synthetic rig (assets aren't in-tree, SURVEY §6): J-joint chain, one
    looping clip with rotation+translation channels per joint, V-vert
    skinned mesh with 4 random bone weights."""
    import numpy as np

    from clap_tpu.anim.clips import (PATH_ROTATION, PATH_TRANSLATION,
                                     build_library, sample_pose)
    from clap_tpu.anim.joints import build_skeleton, joint_matrices
    from clap_tpu.anim.skin import skin_verts_batch

    rng = np.random.default_rng(0)
    # branching rig (depth ~log2 J) — real character skeletons are
    # shallow trees, not J-deep chains; depth sets the sequential cost
    # of the level-parallel hierarchy propagation
    parent = [-1] + [(i - 1) // 2 for i in range(1, n_joints)]
    invbind = np.tile(np.eye(4, dtype=np.float32), (n_joints, 1, 1))
    base_t = rng.standard_normal((n_joints, 3)).astype(np.float32) * 0.1
    base_r = np.tile(np.array([0, 0, 0, 1], np.float32), (n_joints, 1))
    base_s = np.ones((n_joints, 3), np.float32)
    sk = build_skeleton(parent, invbind, base_t, base_r, base_s)

    keys = np.linspace(0, 2.0, 16)
    def qr():
        q = rng.standard_normal((16, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)
    clip = []
    for j in range(n_joints):
        clip.append((j, PATH_ROTATION, keys, qr()))
        clip.append((j, PATH_TRANSLATION, keys,
                     rng.standard_normal((16, 3)).astype(np.float32) * 0.05))
    lib = build_library([clip], n_joints)

    verts = jnp.asarray(rng.standard_normal((n_verts, 3)), jnp.float32)
    normals = verts / jnp.linalg.norm(verts, axis=-1, keepdims=True)
    w = rng.random((n_verts, 4)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w)
    ji = jnp.asarray(rng.integers(0, n_joints, (n_verts, 4)), jnp.int32)

    @jax.jit
    def pose_and_skin(ts):
        def pose_of(t):
            pose = sample_pose(lib, sk.base, jnp.int32(0), t)
            return joint_matrices(sk, pose)
        jts = jax.vmap(pose_of)(ts)          # (B, J, 4, 4)
        # single-contraction batched LBS (instance axis on lanes) —
        # vmapped skin_verts lane-pads its (B, V, 12) intermediate
        return skin_verts_batch(jts, verts, normals, w, ji)[0]

    ts = jnp.linspace(0.0, 2.0, n_inst)
    _sync(pose_and_skin(ts))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = pose_and_skin(ts)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": "skinning_1024inst_ms", "value": dt * 1e3,
            "skinned_verts_per_s": n_inst * n_verts / dt}


def bench_headless(n_envs: int, frames: int = 30):
    """Configs #2/#4: headless testbed step, single + batched."""
    from clap_tpu.engine.step import engine_step, inputs_zero
    from clap_tpu.scene.testbed import build_testbed, replicate_state

    tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                       max_entities=64)
    ins1 = inputs_zero(1)._replace(
        motion=jnp.array([[1.0, 0.0]], jnp.float32))

    if n_envs == 1:
        step = jax.jit(lambda s, i: engine_step(tb.cfg, s, i))
        st = tb.state0
        ins = ins1
    else:
        step = jax.jit(jax.vmap(lambda s, i: engine_step(tb.cfg, s, i)))
        st = replicate_state(tb.state0, n_envs)
        ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), ins1)

    st = step(st, ins)  # compile
    _sync(st)
    t0 = time.perf_counter()
    for _ in range(frames):
        st = step(st, ins)
    _sync(st)
    dt = (time.perf_counter() - t0) / frames
    return dt  # seconds per frame


def bench_full_frame(width=1280, height=720, nr_v=96, n_cubes=0,
                     raster_cap=0, name="full_frame_720p_ms"):
    """Config #5: full frame — culling + rasterizer + shadow/SSAO/bloom/
    SMAA chain at 720p on a procedural scene (terrain + cubes).

    The dense variant (nr_v=240, n_cubes=256 → ~117k tris) is the
    VERDICT-r2 #5 scene scale (ldjam57-like density, clap.c:230-233's
    60 FPS design point); raster_cap lifts the per-tile list capacity so
    the depth-ordered binning cap doesn't silently drop geometry."""
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import (RenderOptions, SceneGeometry,
                                          render_frame)
    from clap_tpu.scene.terrain import terrain_init_square_landscape

    from clap_tpu.render.raster import cluster_faces

    t = terrain_init_square_landscape(3, -32.0, 0.0, -32.0, 64.0, nr_v)
    vx, nrm_np, idx = t.vx, t.norm, t.idx.reshape(-1, 3)
    if n_cubes:
        # scatter cube "entities" on the heightfield (ldjam57 platforms)
        from clap_tpu.scene.primitives import cube

        cv, cn, _cuv, cf = cube(1.6)
        rng = np.random.default_rng(9)
        gx = rng.uniform(-30.0, 30.0, n_cubes)
        gz = rng.uniform(-30.0, 30.0, n_cubes)
        vs, ns, fs = [vx], [nrm_np], [idx]
        base = vx.shape[0]
        hg = t.heights
        nv = hg.shape[0]
        for i in range(n_cubes):
            xi = int((gx[i] + 32.0) / 64.0 * (nv - 1))
            zi = int((gz[i] + 32.0) / 64.0 * (nv - 1))
            h = float(hg[min(xi, nv - 1), min(zi, nv - 1)])
            vs.append(cv + np.array([gx[i], h + 0.8, gz[i]], np.float32))
            ns.append(cn)
            fs.append(cf + base)
            base += cv.shape[0]
        vx = np.concatenate(vs).astype(np.float32)
        nrm_np = np.concatenate(ns).astype(np.float32)
        idx = np.concatenate(fs).astype(np.int32)
    from clap_tpu.render.raster import (expand_corners_major,
                                        expand_corners_record)

    verts = jnp.asarray(vx)
    normals = jnp.asarray(nrm_np)
    f_np = np.asarray(cluster_faces(vx, idx)[0])
    faces = jnp.asarray(f_np)
    V = verts.shape[0]
    geom = SceneGeometry(
        verts=verts, normals=normals, faces=faces,
        face_valid=jnp.ones((faces.shape[0],), bool),
        base_color=jnp.full((V, 3), 0.45),
        rough_metal=jnp.tile(jnp.array([[0.8, 0.0]]), (V, 1)),
        emission=jnp.zeros((V, 3)),
        # static world geometry → corner-expanded record streams (the
        # per-frame corner gather becomes a 3T-row transform)
        corner_verts=jnp.asarray(expand_corners_major(vx, f_np)),
        shadow_corner_verts=jnp.asarray(expand_corners_record(vx, f_np)),
    )
    opts = RenderOptions(width=width, height=height, shadow_size=512,
                         film_grain=0.0, raster_cap=raster_cap)
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

    # real arguments (a zero-arg closure would let XLA constant-fold the
    # whole frame at compile time)
    frame = jax.jit(lambda g, v, p, e: render_frame(opts, g, v, p, lights, e))
    img0 = _sync(frame(geom, view, proj, eye))
    # structural artifact guard (VERDICT r2 weak #8): the timed program
    # must actually depend on its arguments — a nudged camera must
    # change the image, or the timing is measuring a cached constant
    eye2 = eye + jnp.array([0.5, 0.0, 0.0])
    view2 = mx.mat4_look_at(eye2, jnp.array([0.0, 2.0, 0.0]),
                            jnp.array([0.0, 1.0, 0.0]))
    img1 = _sync(frame(geom, view2, proj, eye2))
    depends = bool(jnp.any(jnp.abs(img0 - img1) > 1e-6))
    # binning-saturation honesty: dropped geometry would flatter the
    # timing — report how close the frame is to the per-tile caps
    from clap_tpu.render.raster import (bin_stats, bin_triangles,
                                        clip_near_records)
    from clap_tpu.render.pipeline import clip_transform
    clipv = clip_transform(geom.verts, view, proj)
    rec, ok, _, _ = clip_near_records(clipv, geom.faces, width, height,
                                      geom.face_valid)
    bs = bin_stats(bin_triangles(rec, ok, width, height,
                                 cap=raster_cap or None), width, height)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        img = frame(geom, view, proj, eye)
    _sync(img)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": name, "value": dt * 1e3,
            "fps": 1.0 / dt, "tris": int(faces.shape[0]),
            "input_dependent": depends,
            "tiles_at_cap": bs["tiles_at_cap"],
            "max_per_tile": bs["max_per_tile"]}


def bench_full_frame_production(width=1280, height=720, nr_v=240,
                                n_cubes=256):
    """Dense 720p frame through the PRODUCTION content path: the same
    ~117k-tri scene as full_frame_720p_dense, but built as RenderTables
    entities (static terrain + a dynamic cube-field entity) and
    rendered with the engine's architectural levers ON:

    - kernel_attrs: raster-kernel normal interpolation, no per-pixel
      attr gather (E=2 → packing stride 2 → T cap 4M);
    - static/dynamic shadow split: terrain's 115k tris bake ONCE into a
      2048 bounds atlas; the per-frame CSM rasters only the ~3k cube
      tris.

    The hand-built-geometry dense bench stays alongside as the
    no-levers comparison point."""
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import (RenderOptions,
                                          render_frame_dynamic_batch)
    from clap_tpu.render.scenerender import (assemble_cluster_records_batch,
                                             assemble_scene_geometry_batch,
                                             bake_static_shadow,
                                             build_render_tables,
                                             kernel_attrs_ok,
                                             model_from_mesh)
    from clap_tpu.render.view import make_subview
    from clap_tpu.scene.primitives import cube
    from clap_tpu.scene.terrain import terrain_init_square_landscape

    t = terrain_init_square_landscape(3, -32.0, 0.0, -32.0, 64.0, nr_v)
    cv, cn, _cuv, cf = cube(1.6)
    rng = np.random.default_rng(9)
    gx = rng.uniform(-30.0, 30.0, n_cubes)
    gz = rng.uniform(-30.0, 30.0, n_cubes)
    vs, ns, fs = [], [], []
    base = 0
    hg = t.heights
    nv = hg.shape[0]
    for i in range(n_cubes):
        xi = int((gx[i] + 32.0) / 64.0 * (nv - 1))
        zi = int((gz[i] + 32.0) / 64.0 * (nv - 1))
        h = float(hg[min(xi, nv - 1), min(zi, nv - 1)])
        vs.append(cv + np.array([gx[i], h + 0.8, gz[i]], np.float32))
        ns.append(cn)
        fs.append(np.asarray(cf) + base)
        base += cv.shape[0]
    models = [
        model_from_mesh(t.vx, t.norm, t.idx.reshape(-1, 3),
                        base_color=(0.45, 0.45, 0.45), with_lods=False),
        model_from_mesh(np.concatenate(vs), np.concatenate(ns),
                        np.concatenate(fs), base_color=(0.6, 0.5, 0.4),
                        with_lods=False),
    ]
    rt = build_render_tables(
        models, np.array([0, 1]), np.ones(2, bool),
        entity_shadow_static=np.array([True, False]))
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    # bake once; report cold (compile, amortized by the persistent
    # cache) and WARM execute separately — "bake once" must cost
    # seconds warm, not the one-off compile (VERDICT r3 weak #4)
    mx0 = jnp.tile(jnp.eye(4), (2, 1, 1)).astype(jnp.float32)
    t_bake = time.perf_counter()
    static_shadow = jax.tree.map(_sync, bake_static_shadow(
        rt, mx0, lights.direction[0], shadow_size=2048))
    bake_cold_ms = (time.perf_counter() - t_bake) * 1e3
    t_bake = time.perf_counter()
    static_shadow = jax.tree.map(_sync, bake_static_shadow(
        rt, mx0, lights.direction[0], shadow_size=2048))
    bake_ms = (time.perf_counter() - t_bake) * 1e3
    ka = kernel_attrs_ok(rt)
    opts = RenderOptions(width=width, height=height, shadow_size=512,
                         film_grain=0.0, raster_cap=4096,
                         kernel_attrs=ka)
    # cluster-record front end + per-cluster frustum cull: at this
    # camera ~40% of the 64×64 terrain's sub-clusters are outside the
    # frustum — the entity cull can't drop any of them (one entity).
    # 10240-cluster cap ≈ 1.4× the measured in-view count (reported).
    rec_cap = 10240 * 8
    cluster_rec = ka and rt.cl_rest is not None and bool(
        int(os.environ.get("CLUSTER_REC", "1")))
    eye = jnp.array([[0.0, 18.0, 28.0]])
    proj = mx.mat4_perspective(jnp.pi / 3, width / height, 0.1, 200.0)

    def frame(mxs, eyes):
        views = jax.vmap(lambda e: mx.mat4_look_at(
            e, jnp.array([0.0, 2.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0])))(eyes)
        planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
        if cluster_rec:
            geom, axes = assemble_cluster_records_batch(
                rt, mxs, jnp.ones((1, 2), bool), planes, eyes, views,
                proj, cap=rec_cap)
        else:
            geom, axes = assemble_scene_geometry_batch(
                rt, mxs, jnp.ones((1, 2), bool), planes, eyes,
                skip_culling=jnp.array([True, False]))
        return render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                          lights, eyes,
                                          static_shadow=static_shadow)

    fj = jax.jit(frame)
    mxs = jnp.tile(jnp.eye(4), (1, 2, 1, 1)).astype(jnp.float32)
    img0 = _sync(fj(mxs, eye))
    img1 = _sync(fj(mxs, eye + jnp.array([[0.5, 0.0, 0.0]])))
    depends = bool(jnp.any(jnp.abs(img0 - img1) > 1e-6))
    clusters_at_cap = None
    if cluster_rec:
        views = jax.vmap(lambda e: mx.mat4_look_at(
            e, jnp.array([0.0, 2.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0])))(eye)
        planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
        g1, _ = assemble_cluster_records_batch(
            rt, mxs, jnp.ones((1, 2), bool), planes, eye, views, proj,
            cap=rec_cap)
        from clap_tpu.render.raster import CLUSTER

        nval = int(np.asarray(g1.comp_valid).sum()) // CLUSTER
        clusters_at_cap = bool(nval >= rec_cap // CLUSTER)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        img = fj(mxs, eye)
    _sync(img)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": "full_frame_720p_production_ms", "value": dt * 1e3,
            "fps": 1.0 / dt, "tris": int(rt.faces.shape[0]),
            "kernel_attrs": bool(ka), "bake_warm_ms": bake_ms,
            "bake_cold_ms": bake_cold_ms,
            "dyn_shadow_tris": int(rt.shadow_faces.shape[0]),
            "cluster_rec": bool(cluster_rec),
            "clusters_at_cap": clusters_at_cap,
            "input_dependent": depends}


def bench_batched_render(n_envs: int = 64, res: int = 256):
    """North-star rendering half: N envs × 256² frames (shared scene,
    per-env cameras) — one vmapped frame program."""
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.render.lights import lights_empty
    from clap_tpu.render.pipeline import RenderOptions
    from clap_tpu.render.scenerender import (assemble_scene_geometry_batch,
                                             build_render_tables,
                                             kernel_attrs_ok,
                                             model_from_mesh)
    from clap_tpu.render.view import make_subview
    from clap_tpu.scene.terrain import terrain_init_square_landscape

    t = terrain_init_square_landscape(11, -16.0, 0.0, -16.0, 32.0, 48)
    # production content path (RenderTables → assembly → kernel_attrs):
    # the shared terrain is one entity; KERNEL_ATTRS=0 reverts to the
    # hand-geometry gather path for A/B
    rt = build_render_tables(
        [model_from_mesh(t.vx, t.norm, t.idx.reshape(-1, 3),
                         with_lods=False)],
        np.array([0]), np.ones(1, bool))
    ka = kernel_attrs_ok(rt) and bool(
        int(os.environ.get("KERNEL_ATTRS", "1")))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)
    eye0 = jnp.array([[12.0, 9.0, 0.0]])
    view0 = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eye0)
    planes0 = jax.vmap(lambda v: make_subview(v, proj).planes)(view0)
    geom_b, _axes = assemble_scene_geometry_batch(
        rt, jnp.tile(jnp.eye(4), (1, 1, 1, 1)).astype(jnp.float32),
        jnp.ones((1, 1), bool), planes0, eye0,
        skip_culling=jnp.array([True]))
    # squeeze the env axis (per-env leaves only, per the axes tree):
    # one SHARED static scene for all views
    geom = jax.tree.map(lambda x, a: x[0] if a == 0 else x,
                        geom_b, _axes, is_leaf=lambda x: x is None)
    opts = RenderOptions(width=res, height=res, shadow_size=256,
                         film_grain=0.0, ssao=False, kernel_attrs=ka)
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.ones(3)),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    ang = jnp.linspace(0, 2 * jnp.pi, n_envs, endpoint=False)
    eyes = jnp.stack([12 * jnp.cos(ang), jnp.full((n_envs,), 9.0),
                      12 * jnp.sin(ang)], -1)
    views = jax.vmap(lambda e: mx.mat4_look_at(
        e, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])))(eyes)
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 100.0)

    from clap_tpu.render.pipeline import render_frame_batch

    # shared-scene multi-view batch: one stable light atlas for all envs
    # (geometry and light are shared here; per-env dynamic scenes use
    # shared_shadow=False)
    frame = jax.jit(lambda vw, e: render_frame_batch(
        opts, geom, vw, proj, lights, e, far=100.0))
    img = _sync(frame(views, eyes))
    # content sanity: the assembly above culled against ONE reference
    # view (the terrain entity skips culling so every view sees it); a
    # blank batch would mean the squeeze or validity wiring broke
    img_std = float(jnp.std(img))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        img = frame(views, eyes)
    _sync(img)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": f"batched_render_{n_envs}x{res}_ms", "value": dt * 1e3,
            "frames_per_s": n_envs / dt, "kernel_attrs": bool(ka),
            "img_std": img_std}


def bench_step_and_render(n_envs: int = 64, res: int = 256,
                          frames: int = 10, chunk: int = 64,
                          internal_scale: int = 1,
                          return_images: bool = False,
                          textured: bool = False):
    # chunk=64: per-env G-buffers + the 128-lane-padded attr-gather
    # output are ~35 MB/env at 256² — a single 256-env vmap would
    # materialize ~9 GB of transient per frame (v5e HBM is 16 GB);
    # lax.map over 64-env chunks keeps the peak at the measured-safe
    # 64-env working set.
    """THE north-star composition: vmapped game_step (sim + rules +
    batched rig animation) + per-env dynamic geometry assembly +
    render_frame — ONE jitted XLA program per frame, per-env entity
    transforms through assemble_scene_geometry_batch, characters,
    per-env CSM shadows and the standard post chain (SSAO ON) at res².

    Envs beyond ``chunk`` render through lax.map over env chunks (the
    full vmap would materialize every env's G-buffers at once).
    """
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
                                             default_edge_ids,
                                             kernel_attrs_ok,
                                             shadow_static_mask)
    from clap_tpu.render.view import make_subview
    from clap_tpu.scene.testbed import (build_demo_rig, build_testbed,
                                        replicate_state, build_testbed_char_skin,
                                        testbed_models)

    n_chars = 2
    # terrain split into 4×4 chunk entities: frustum culling + distance
    # LOD apply to terrain per env (the monolithic mesh always drew all
    # ~32k faces at LOD0 with culling skipped)
    tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                       max_entities=96, n_chars=n_chars, terrain_chunks=4)
    sk, lib, acfg = build_demo_rig()
    gcfg = game_config_empty(1, 96)._replace(
        switch_entity=jnp.array([0], jnp.int32),
        switch_valid=jnp.array([True]),
        switch_permanent=jnp.array([True]))
    gw = GameWorld(scene=tb.cfg, game=gcfg, anim=acfg, anim_sk=sk,
                   anim_lib=lib)
    gs1 = GameSessionState(engine=tb.state0,
                           game=game_state_init(1, n_chars),
                           anim=anim_instances_init(n_chars),
                           # non-None from frame 0: a None→array treedef
                           # flip would retrace inside the timing loop
                           joint_mats=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                                               (n_chars, 3, 1, 1)))

    # skinned characters (VERDICT r4 #2): the roster renders as
    # LBS-deformed ring-column meshes entering the record stream as a
    # per-env dynamic range (charskin.py). SKIN=0 reverts to the rigid
    # proxies for A/B runs.
    skin_on = bool(int(os.environ.get("SKIN", "1")))
    # textured=True (VERDICT r4 #7): char + tree carry uv/texture layers
    # so the frame takes the per-pixel material-gather path — the honest
    # cost of model.frag-style sampling next to the kernel_attrs
    # flat-material fast path the default config measures.
    models = testbed_models(tb, skinned_chars=skin_on, textured=textured)
    textures = None
    if textured:
        from clap_tpu.scene.testbed import testbed_textures

        textures = testbed_textures()
    ent = tb.cfg.entities
    edge = default_edge_ids(np.asarray(ent.active),
                            np.asarray(ent.body_is_char))
    # static/dynamic shadow split: terrain/trees bake ONCE into a
    # bounds-fit 1024 atlas; per-env CSM rasters only the dynamic
    # casters (chars + phys cubes). STATIC_SHADOW=0 reverts.
    static_on = bool(int(os.environ.get("STATIC_SHADOW", "1")))
    rt = build_render_tables(
        models, np.asarray(ent.model_id), np.asarray(ent.active),
        entity_edge_id=edge,
        entity_shadow_static=shadow_static_mask(ent) if static_on
        else None)
    cskin = build_testbed_char_skin(tb, models, rt) if skin_on else None
    lights = lights_empty(1)
    d = jnp.array([-0.4, -0.8, -0.4])
    lights = lights._replace(
        direction=lights.direction.at[0].set(d / jnp.linalg.norm(d)),
        color=lights.color.at[0].set(jnp.array([1.0, 0.95, 0.9])),
        is_dir=lights.is_dir.at[0].set(True),
        active=lights.active.at[0].set(True))
    static_shadow = None
    if static_on and rt.static_shadow_faces is not None \
            and rt.static_shadow_faces.shape[0] > 0:
        static_shadow = bake_static_shadow(rt, tb.state0.mx,
                                           lights.direction[0],
                                           shadow_size=1024, far=200.0)
    # kernel_attrs: raster-kernel normal interpolation + per-entity
    # one-hot flats — removes the per-pixel attr-table gather (the
    # dominant HBM term; exact image parity, test_dynamic_batch).
    # KERNEL_ATTRS=0 reverts to the gather path for A/B runs.
    opts = RenderOptions(width=res, height=res, shadow_size=256,
                         film_grain=0.0,
                         internal_scale=internal_scale,
                         # valid-first face compaction: with the
                         # per-cluster frustum cull + res-scaled LOD the
                         # testbed keeps ~4.1k faces in view — 8192 is
                         # ~1.8× that (saturation measured + reported
                         # below via clusters_at_cap)
                         record_compact=8192,
                         # per-tile capacity: res-scaled LOD leaves the
                         # densest 16×128 sub-tile at ~800 records; 2048
                         # coarse (1280/sub-tile) is 1.6× headroom and
                         # trims the per-grid-step record DMA
                         raster_cap=2048,
                         kernel_attrs=kernel_attrs_ok(rt) and bool(
                             int(os.environ.get("KERNEL_ATTRS", "1"))))
    # CLUSTER_REC=0 reverts to member-granularity assembly for A/B runs
    cluster_rec = (opts.kernel_attrs and rt.cl_rest is not None
                   and bool(int(os.environ.get("CLUSTER_REC", "1"))))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 200.0)
    skip = ent.skip_culling
    # constant screen-space-error LOD: the 30/60/120 m chain distances
    # are the 720p design point (model.c:975-998); a 256² target
    # switches proportionally closer — same pixels-per-triangle, ~2×
    # fewer walked records on the terrain. Keyed on the OUTPUT
    # resolution (not the internal_scale shading res) so the shading-
    # rate lever changes shading only, never geometry — the PSNR
    # statement below compares like-for-like silhouettes.
    # LOD_SCALE=1 reverts.
    lod_scale = float(os.environ.get("LOD_SCALE", max(res, 64) / 720.0))

    def render_chunk(args):
        sts, jmats = args
        cam = sts.camera

        def view_of(c):
            q = mx.qmul(
                mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), c.yaw),
                mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]),
                                        c.pitch))
            return camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]

        views = jax.vmap(view_of)(cam)
        planes = jax.vmap(lambda v: make_subview(v, proj).planes)(views)
        if cluster_rec:
            # cluster-granularity record front end: validity/compaction/
            # world+clip at ~T/8 cluster rows, zero per-env gathers
            # before the per-tile record fetch (test_cluster_records)
            geom, axes = assemble_cluster_records_batch(
                rt, sts.mx, sts.visible, planes, cam.pos, views, proj,
                cap=opts.record_compact, skip_culling=skip,
                char_skin=cskin, joint_mats=jmats, lod_scale=lod_scale)
        else:
            geom, axes = assemble_scene_geometry_batch(
                rt, sts.mx, sts.visible, planes, cam.pos,
                skip_culling=skip, char_skin=cskin, joint_mats=jmats,
                lod_scale=lod_scale)
        return render_frame_dynamic_batch(opts, geom, axes, views, proj,
                                          lights, cam.pos, far=200.0,
                                          static_shadow=static_shadow,
                                          textures=textures)

    @jax.jit
    def step_and_render(gss, ins):
        gss = jax.vmap(lambda s, i: game_step(gw, s, i))(gss, ins)
        sj = (gss.engine, gss.joint_mats)
        if n_envs <= chunk:
            imgs = render_chunk(sj)
        else:
            chunked = jax.tree.map(
                lambda x: x.reshape(n_envs // chunk, chunk, *x.shape[1:]),
                sj)
            imgs = jax.lax.map(render_chunk, chunked)
            imgs = imgs.reshape(n_envs, *imgs.shape[2:])
        if return_images:
            return gss, imgs
        # luma mean per env: returning full frames would make host
        # transfer the bottleneck; the reduce keeps all render work live
        return gss, jnp.mean(imgs, axis=(1, 2, 3))

    gss = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)), gs1)
    ins1 = inputs_zero(n_chars)._replace(
        motion=jnp.zeros((n_chars, 2), jnp.float32).at[0, 0].set(1.0))
    ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)),
                       ins1)
    gss, out = step_and_render(gss, ins)
    _sync(out)
    clusters_at_cap = None
    if cluster_rec:
        # compaction-cap honesty (the full-frame tiles_at_cap analogue):
        # saturated kvalid would mean valid clusters were DROPPED
        sts1 = jax.tree.map(lambda x: x[:1], gss.engine)
        cam1 = sts1.camera

        def view1(c):
            q = mx.qmul(
                mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), c.yaw),
                mx.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]),
                                        c.pitch))
            return camera_view_proj(c.pos, q, jnp.pi / 3, 1.0)[0]

        v1 = jax.vmap(view1)(cam1)
        p1 = jax.vmap(lambda v: make_subview(v, proj).planes)(v1)
        g1, _ = assemble_cluster_records_batch(
            rt, sts1.mx, sts1.visible, p1, cam1.pos, v1, proj,
            cap=opts.record_compact, skip_culling=skip,
            lod_scale=lod_scale)
        from clap_tpu.render.raster import CLUSTER

        nval = int(np.asarray(g1.comp_valid).sum()) // CLUSTER
        clusters_at_cap = bool(nval >= opts.record_compact // CLUSTER)
    if return_images:
        return np.asarray(out)
    luma = out
    t0 = time.perf_counter()
    for _ in range(frames):
        gss, luma = step_and_render(gss, ins)
    _sync(luma)
    dt = (time.perf_counter() - t0) / frames
    tag = f"_s{internal_scale}" if internal_scale > 1 else ""
    if textured:
        tag += "_tex"
    out = {"metric": f"step_and_render_{n_envs}x{res}{tag}_ms",
           "value": dt * 1e3, "env_fps": n_envs / dt,
           "kernel_attrs": bool(opts.kernel_attrs),
           "lod_scale": round(lod_scale, 4),
           "mean_luma": float(luma[0])}
    if clusters_at_cap is not None:
        out["clusters_at_cap"] = clusters_at_cap
    return out


def bench_shading_rate(res: int = 256, scales=(2,)):
    # scales=(2,) only: each scale is a fresh multi-minute composed
    # compile over the axon tunnel; internal_scale=2 is the recorded
    # quality/fps statement (VERDICT r4 #3) — pass scales=(2, 4) for
    # the full curve when iterating locally.
    """VERDICT r3 #2: the internal-resolution lever's measured quality
    cost — PSNR of the composed frame at each internal scale vs the
    full-res frame (same env/state), reported next to the env-fps the
    64-env configs measure."""
    ref = bench_step_and_render(n_envs=8, res=res, return_images=True)
    out = {}
    for s in scales:
        img = bench_step_and_render(n_envs=8, res=res, internal_scale=s,
                                    return_images=True)
        mse = float(np.mean((img - ref) ** 2))
        out[str(s)] = {"psnr_db": 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))}
    return out


def kernel_parity_check():
    """On-device parity of the Pallas kernels vs their reference
    implementations (VERDICT r1 #9: CI interprets the kernels on CPU, so
    a Mosaic-vs-interpret divergence would otherwise ship silently).
    Runs BEFORE timing; returns True only if both kernels match."""
    import numpy as np

    from clap_tpu import mathx as mx
    from clap_tpu.ops.ca2d import CA_TEST, ca2d_run, ca2d_run_pallas, ca2d_seed
    from clap_tpu.render.raster import (assemble_tri_records, bin_triangles,
                                        project_to_screen, raster_brute,
                                        rasterize)
    from clap_tpu.scene.terrain import terrain_init_square_landscape

    ok = True
    # ca2d: fused Pallas vs lax.scan reference, 32 generations
    key = jax.random.PRNGKey(3)
    g = ca2d_seed(CA_TEST, key, (64, 64))
    a = np.asarray(ca2d_run_pallas(CA_TEST, g, 32))
    b = np.asarray(ca2d_run(CA_TEST, g, 32))
    ok &= bool((a == b).all())

    # rasterizer: Mosaic kernel vs brute-force oracle on a small scene
    t = terrain_init_square_landscape(5, -8.0, 0.0, -8.0, 16.0, 24)
    verts = jnp.asarray(t.vx)
    faces = jnp.asarray(t.idx.reshape(-1, 3))
    eye = jnp.array([6.0, 6.0, 6.0])
    view = mx.mat4_look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = mx.mat4_perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    clip = jnp.einsum("ij,vj->vi", proj @ view, jnp.concatenate(
        [verts, jnp.ones_like(verts[:, :1])], -1))
    W = H = 128
    sx, sy, z, iw = project_to_screen(clip, W, H)
    rec, okm = assemble_tri_records(sx, sy, z, iw, faces,
                                    jnp.ones((faces.shape[0],), bool))
    gb = rasterize(rec, bin_triangles(rec, okm, W, H), W, H)
    gb_ref = raster_brute(rec, okm, W, H)
    tid_a = np.asarray(gb.tri_id)
    tid_b = np.asarray(gb_ref.tri_id)
    same = tid_a == tid_b
    # allow a sliver of edge pixels to disagree (fp associativity between
    # the coefficient kernel and the direct-eval oracle)
    ok &= bool(same.mean() > 0.995)
    da = np.asarray(gb.depth)[same & (tid_a >= 0)]
    db = np.asarray(gb_ref.depth)[same & (tid_b >= 0)]
    ok &= bool(np.allclose(da, db, atol=1e-4))
    return bool(ok)


# ---------------------------------------------------------------------------
# survivable harness (VERDICT r4 #1)

_T0 = time.perf_counter()
_RESULTS = {
    "metric": "batched env sim-steps/sec/chip (testbed scene, headless)",
    "value": 0.0,
    "unit": "env-steps/s",
    "vs_baseline": 0.0,
    "backend": None,
    "n_envs": 0,
    "final": False,
    "sub": {},
}


def _emit(final: bool = False):
    """Print the merged snapshot as ONE JSON line + mirror it to disk.

    Called after every completed config and from the exit/signal
    handlers: the LAST parseable line of stdout is always the freshest
    snapshot, so a mid-run kill cannot erase finished results."""
    _RESULTS["final"] = bool(final)
    _RESULTS["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    line = json.dumps(_RESULTS)
    print(line, flush=True)
    try:
        part = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_PARTIAL.json")
        with open(part, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _on_signal(signum, frame):  # pragma: no cover - signal path
    _RESULTS["killed_by_signal"] = int(signum)
    _emit(final=False)
    os._exit(1)


def run_headless(backend):
    """Headline: headless single + batched env-steps/s, regression floor."""
    sub = {}
    dt1 = bench_headless(1)
    sub["headless_single_ms"] = dt1 * 1e3
    n_envs = 4096 if backend == "tpu" else 64
    dtN = bench_headless(n_envs)
    env_steps_per_s = n_envs / dtN
    sub[f"headless_{n_envs}_ms_per_frame"] = dtN * 1e3

    # regression floor (VERDICT r3 #3): fail LOUDLY if the headline
    # metric falls >5% below the best recorded round (r4 builder-measured
    # 875k after the pair-list/patch solver work; r2 was 672k)
    HEADLESS_FLOOR = 875_000
    if backend == "tpu":
        ok = env_steps_per_s >= 0.95 * HEADLESS_FLOOR
        sub["headless_floor"] = {"best_recorded": HEADLESS_FLOOR,
                                 "ok": bool(ok)}
        if not ok:
            print(f"REGRESSION: headless {env_steps_per_s:,.0f} env-steps/s"
                  f" is >5% below the recorded best {HEADLESS_FLOOR:,}",
                  file=sys.stderr)

    target = 4096 * 60.0
    _RESULTS["value"] = round(env_steps_per_s, 1)
    _RESULTS["vs_baseline"] = round(env_steps_per_s / target, 4)
    _RESULTS["n_envs"] = n_envs
    _RESULTS["sub"].update(sub)
    return {"env_steps_per_s": round(env_steps_per_s, 1)}


def run_shading_rate():
    rate = bench_shading_rate()
    for s in (2,):
        r = bench_step_and_render(n_envs=64, internal_scale=s)
        rate[str(s)].update({"value": r["value"], "env_fps": r["env_fps"]})
    return rate


def _configs(backend):
    """(key, cost-estimate seconds [cold-cache-ish], thunk). Ordered
    cheapest/most-important first so the headline + the VERDICT-r4
    must-record set (headless, composed 64, dense 720p, production,
    floor verdict) land before the expensive tail."""
    # cost estimates are COLD-cache seconds measured on the r5 priming
    # run (axon-tunnel compiles dominate; the persistent cache does not
    # reliably cover the TPU executables, so every run budgets as cold);
    # per-config deadline = 2x est
    on_tpu = backend == "tpu"
    configs = [
        ("headless", 500, lambda: run_headless(backend)),
        ("ca2d", 60, bench_ca2d),
        ("skinning", 250, bench_skinning),
        ("step_and_render", 1000, lambda: {
            str(64 if on_tpu else 8):
                bench_step_and_render(n_envs=64 if on_tpu else 8)}),
        ("full_frame_dense", 350, lambda: bench_full_frame(
            nr_v=240, n_cubes=256, raster_cap=4096,
            name="full_frame_720p_dense_ms")),
        ("full_frame_production", 400, bench_full_frame_production),
        ("kernel_parity", 200, kernel_parity_check),
        ("batched_render", 250, bench_batched_render),
        ("full_frame", 600, bench_full_frame),
    ]
    if on_tpu:
        configs += [
            ("step_and_render_textured", 900, lambda: {
                "64tex": bench_step_and_render(n_envs=64, textured=True)}),
            ("shading_rate", 1100, run_shading_rate),
            ("step_and_render_256", 800,
             lambda: {"256": bench_step_and_render(n_envs=256)}),
        ]
    return configs


_CHILD_MARK = "BENCHCFG "


def child_main(key):
    """--config KEY mode: run one config, print its result as a marked
    JSON line. Runs inside the per-config subprocess."""
    backend = jax.default_backend()
    for k, _est, thunk in _configs(backend):
        if k == key:
            out = {"result": thunk(), "headline": _RESULTS
                   if k == "headless" else None}
            print(_CHILD_MARK + json.dumps(out), flush=True)
            return 0
    print(_CHILD_MARK + json.dumps(
        {"result": {"error": f"unknown config {key}"}}), flush=True)
    return 2


def main():
    import subprocess

    backend = jax.default_backend()
    _RESULTS["backend"] = backend
    # default budget 4800 s: the r3 driver run completed a ~60-90 min
    # bench (rc=0), so the driver's own timeout is comfortably above
    # this; the r5 cold-cost sum of the must-record set (headless,
    # composed 64, dense, production, parity, batched, full_frame) is
    # ~3000 s, leaving ~1800 s for the tail configs. Incremental
    # emission + the SIGTERM handler keep the artifact valid even if
    # the driver kills us first.
    budget = float(os.environ.get("BENCH_BUDGET_S", "4800"))
    _RESULTS["budget_s"] = budget
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    atexit.register(lambda: None if _RESULTS.get("final") else _emit(False))

    me = os.path.abspath(__file__)
    for i, (key, est, _thunk) in enumerate(_configs(backend)):
        remaining = budget - (time.perf_counter() - _T0)
        # the headline config is exempt from the governor: a bench
        # artifact without the north-star number is not an artifact
        if i > 0 and est > remaining:
            _RESULTS["sub"][key] = {"skipped": "budget", "est_s": est,
                                    "remaining_s": round(remaining, 1)}
            continue
        # per-config deadline: twice the estimate (compiles dominate and
        # are hard to predict cold), clipped to the remaining budget;
        # the headline config may use the whole remaining budget
        deadline = remaining if i == 0 else min(2.0 * est, remaining)
        t0 = time.perf_counter()
        out = None
        try:
            proc = subprocess.run(
                [sys.executable, me, "--config", key],
                stdout=subprocess.PIPE, timeout=deadline)
            for ln in proc.stdout.decode(errors="replace").splitlines():
                if ln.startswith(_CHILD_MARK):
                    out = json.loads(ln[len(_CHILD_MARK):])
            if out is None:
                out = {"result": {"error":
                                  f"child rc={proc.returncode}, no result"}}
        except subprocess.TimeoutExpired:
            out = {"result": {"skipped": "config-timeout",
                              "deadline_s": round(deadline, 1)}}
        except Exception as e:  # pragma: no cover
            out = {"result": {"error": str(e)[:300]}}
        took = round(time.perf_counter() - t0, 1)
        res = out.get("result")
        if out.get("headline"):
            for f in ("value", "vs_baseline", "n_envs"):
                _RESULTS[f] = out["headline"][f]
            _RESULTS["sub"].update(out["headline"]["sub"])
        if key.startswith("step_and_render") and isinstance(res, dict) \
                and "error" not in res and "skipped" not in res:
            _RESULTS["sub"].setdefault("step_and_render", {}).update(res)
            _RESULTS["sub"]["step_and_render"]["took_s"] = took
        else:
            _RESULTS["sub"][key] = res
            if isinstance(res, dict):
                res["took_s"] = took
        _emit(final=False)

    _emit(final=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        sys.exit(child_main(sys.argv[2]))
    sys.exit(main())
