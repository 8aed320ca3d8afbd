#!/usr/bin/env python
"""Device-op trace of the headless engine_step at 4096 envs: dump the
top XLA ops by total device time (the same method ROUND_NOTES used on
the composed frame)."""
import glob
import gzip
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clap_tpu.engine import step as S
from clap_tpu.scene.testbed import build_testbed, replicate_state

N = int(os.environ.get("N_ENVS", "4096"))
OUT = os.environ.get("TRACE_DIR", "/tmp/trace_headless")

tb = build_testbed(seed=42, side=64.0, nr_v=128, n_dynamic=8,
                   max_entities=64)
ins1 = S.inputs_zero(1)._replace(motion=jnp.array([[1.0, 0.0]], jnp.float32))
st = replicate_state(tb.state0, N)
ins = jax.tree.map(lambda x: jnp.broadcast_to(x, (N, *x.shape)), ins1)

step = jax.jit(jax.vmap(lambda s, i: S.engine_step(tb.cfg, s, i)))
st = step(st, ins)
jax.block_until_ready(st)

with jax.profiler.trace(OUT):
    for _ in range(10):
        st = step(st, ins)
    jax.block_until_ready(st)

# parse the trace: aggregate device-track events by name
files = glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                  recursive=True)
latest = max(files, key=os.path.getmtime)
with gzip.open(latest, "rt") as f:
    doc = json.load(f)
events = doc.get("traceEvents", [])
# find device-track pids (TPU / device compute)
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower() or "Device" in n}
agg = {}
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3   # us -> ms
    a = agg.setdefault(name, [0.0, 0])
    a[0] += dur
    a[1] += 1
    total += dur
print(f"device total: {total:.2f} ms over 10 frames "
      f"({total/10:.3f} ms/frame)")
print(f"{'op':64s} {'ms/fr':>8s} {'count':>6s}")
for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]:
    print(f"{name[:64]:64s} {ms/10:8.4f} {cnt:6d}")
