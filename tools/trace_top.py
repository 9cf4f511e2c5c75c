#!/usr/bin/env python3
"""Parse the most recent /tmp/jaxtrace profile and print the top individual
device ops (leaf events, not while-wrappers) with their long_name, to
attribute generic 'fusion'/'copy' time to source ops."""
import glob
import gzip
import json
import sys
from collections import defaultdict

files = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
if not files:
    sys.exit("no trace found")
f = files[-1]
with gzip.open(f, "rt") as fh:
    d = json.load(fh)

agg = defaultdict(float)
cnt = defaultdict(int)
sample = {}
for ev in d.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    name = ev.get("name", "")
    if name.startswith("while") or name.startswith("jit_"):
        continue
    args = ev.get("args", {})
    ln = args.get("long_name", "")
    if not (ln or "fusion" in name or "copy" in name or
            name.startswith("fused_")):
        continue
    dur = ev.get("dur", 0) / 1e3
    key = name.split(".")[0]
    # split copies / fusions by their output shape signature in long_name
    shape = ln.split("=")[0].strip() if "=" in ln else ""
    k2 = f"{key} {shape}"[:90]
    agg[k2] += dur
    cnt[k2] += 1
    if k2 not in sample and ln:
        sample[k2] = ln[:500]

rows = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
tot = sum(agg.values())
print(f"total leaf device time: {tot:.1f} ms")
for k, v in rows:
    print(f"{v:9.2f} ms x{cnt[k]:5d}  {k}")
    if k in sample:
        print(f"           {sample[k][:260]}")
