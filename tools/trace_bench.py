#!/usr/bin/env python3
"""Capture a jax.profiler trace of the headline bench solve and print the
top XLA ops by total device time (parsed straight from the .trace.json.gz,
no TensorBoard needed)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import bench

solve_b, plan, pen_b, x0_b, Xb_b, Ub_b, metric = bench.build_bench_setup()
s = solve_b(plan, pen_b, x0_b, Xb_b, Ub_b)
jax.block_until_ready(s)

tdir = "/tmp/jaxtrace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(3):
        s = solve_b(plan, pen_b, x0_b, Xb_b, Ub_b)
    jax.block_until_ready(s)

# parse the trace
files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        d = json.load(fh)
    for ev in d.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pidname = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3   # ms
        args = ev.get("args", {})
        # keep device-side ops only (heuristic: has 'long_name' or tid on
        # a TPU pid); aggregate by op name prefix
        if "fusion" in name or "copy" in name or "%" in name or \
                args.get("long_name"):
            key = name.split(".")[0][:60]
            agg[key] += dur
            cnt[key] += 1
            total += dur
rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
print(f"total device op time over 3 solves: {total:.1f} ms")
for k, v in rows:
    print(f"{v:9.2f} ms  x{cnt[k]:5d}  {k}")
