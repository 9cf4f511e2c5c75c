#!/usr/bin/env python3
"""On-device MPC replan-latency probe vs the reference's 18 ms budget
(0.9 * dt_mpc, MHPCLocomotion.cpp:122).

Measures ONE un-batched MHPC cascade solve at the runtime iteration caps
(the production replan program) over >= n re-solves:
  * wall-clock per solve through the axon tunnel (dispatch + RTT + device),
  * tunnel RTT baseline (trivial jitted op, same path),
  * device-side busy time per solve parsed from a jax.profiler trace —
    the honest on-device latency number the tunnel can't pollute.

Prints one JSON line with p50/p95 of each.  Usage:
  python tools/latency_probe.py [--n 100] [--config mhpc|hkd]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
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
from cafempc_tpu.solver.hsddp import make_solver


def device_busy_ms(tdir, n_solves):
    """Mean duration of the module-level jit_solve executions on the
    device track (avoids double-counting nested op events)."""
    durs = []
    for f in glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            d = json.load(fh)
        for ev in d.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            if name.startswith("jit_solve") or name == "jit_solve":
                durs.append(ev.get("dur", 0) / 1e3)
    if not durs:
        return float("nan")
    durs.sort()
    # module events appear once per solve per track; take the longest
    # n_solves (device track) and average
    top = durs[-n_solves:]
    return sum(top) / len(top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--trace-n", type=int, default=10)
    args = ap.parse_args()
    dtype = jnp.float32

    # un-batched runtime-caps cascade solve: the replan program the
    # reference runs every 20 ms
    fns, opts, plan, pen, x0, Xb, Ub, metric = bench.build_mhpc(dtype)
    solve = jax.jit(make_solver(fns, opts, trim_output=True,
                                max_resets=16))
    x0j = jnp.asarray(x0, dtype)
    Xbj = jnp.asarray(Xb, dtype)
    Ubj = jnp.asarray(Ub, dtype)

    s = solve(plan, pen, x0j, Xbj, Ubj)
    jax.block_until_ready(s)

    # tunnel RTT baseline — measured with an actual device->host COPY
    # (np.asarray), the same fencing the solve measurements use
    tiny = jax.jit(lambda a: a + 1.0)
    t = jnp.zeros(8, dtype)
    np.asarray(tiny(t))
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(tiny(t))
        rtts.append((time.perf_counter() - t0) * 1e3)

    # wall-clock per blocking solve (block_until_ready — kept for
    # comparison; the tunnel has acked this early before, PERF.md)
    walls = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        s = solve(plan, pen, x0j, Xbj, Ubj)
        jax.block_until_ready(s)
        walls.append((time.perf_counter() - t0) * 1e3)

    # FENCED wall-clock: time to a host-materialized scalar from each
    # solve's result.  A device->host copy of s.cost cannot complete
    # before the solve has actually executed, so this interval provably
    # contains device execution — the framework-owned end-to-end
    # latency VERDICT r4 #6 asked for (no trust in the tunnel's ack
    # semantics).
    fences = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        s = solve(plan, pen, x0j, Xbj, Ubj)
        float(np.asarray(s.cost))
        fences.append((time.perf_counter() - t0) * 1e3)

    # device busy time from a profiler trace
    tdir = "/tmp/jaxtrace_latency"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(args.trace_n):
            s = solve(plan, pen, x0j, Xbj, Ubj)
        jax.block_until_ready(s)
    dev_ms = device_busy_ms(tdir, args.trace_n)

    walls = np.asarray(walls)
    fences = np.asarray(fences)
    rtts = np.asarray(rtts)
    print(json.dumps({
        "metric": "mhpc_replan_latency_ms",
        "n": args.n,
        "wall_p50": round(float(np.percentile(walls, 50)), 2),
        "wall_p95": round(float(np.percentile(walls, 95)), 2),
        "fenced_wall_p50": round(float(np.percentile(fences, 50)), 2),
        "fenced_wall_p95": round(float(np.percentile(fences, 95)), 2),
        "tunnel_rtt_p50": round(float(np.percentile(rtts, 50)), 2),
        "wall_minus_rtt_p50": round(float(
            np.percentile(walls, 50) - np.percentile(rtts, 50)), 2),
        "fenced_minus_rtt_p50": round(float(
            np.percentile(fences, 50) - np.percentile(rtts, 50)), 2),
        "device_busy_ms_per_solve": round(float(dev_ms), 2),
        "budget_ms": 18.0,
    }))


if __name__ == "__main__":
    main()
