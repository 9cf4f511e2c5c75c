#!/usr/bin/env python3
"""Virtual-mesh scaling artifact (VERDICT r4 #8): batched-solver
throughput with the scenario batch sharded over 1/2/4/8 virtual CPU
devices, plus a (scenario x knot) 2D-mesh point for the knot-sharded
sweep.

Real multi-chip hardware is not available in this image (one v5e through
the tunnel), so this pins the SHAPE of the shard_map scaling story the
>=80%-efficiency target will be judged on: on an oversubscribed 2-core
host, virtual devices cannot speed anything up — the honest signal is
the SHARDING OVERHEAD, t_sharded(n) / t_vmap(1) at a fixed total batch.
A ratio near 1.0 means the shard_map partitioning (replicated plan,
scenario-split batch, collective-free DP path) adds nothing on top of
the vmap compute; the multi-chip speedup then rides entirely on real
parallel hardware.

Writes SCALING_r<N>.json:
  {"config": "hkd", "total_batch": B,
   "points": [{"devices": n, "mesh": "...", "wall_s": t,
               "solves_per_s": r, "overhead_vs_vmap": t/t1}, ...]}

Usage: python tools/scaling_probe.py [--batch 32] [--iters 3]
       [--out SCALING_r05.json]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
# must precede the jax import: 8 virtual host devices
_os.environ["XLA_FLAGS"] = _os.environ.get("XLA_FLAGS", "") \
    + " --xla_force_host_platform_device_count=8"

import argparse
import json
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  _os.path.join(_os.path.dirname(_os.path.dirname(
                      _os.path.abspath(__file__))), "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from cafempc_tpu.models import hkd
from cafempc_tpu.parallel.mesh import (make_batched_solver, replicate,
                                       scenario_knot_mesh, scenario_mesh,
                                       shard_batch)
from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.reference.quad_reference import (QuadReference,
                                                  load_quad_reference)
from cafempc_tpu.solver.options import SolverOptions
from cafempc_tpu.solver.plan import host_plan_to_device

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def build(dtype, plan_dur=1.0, n_steps=112):
    """The bench config-1 problem (112-knot HKD bound gait)."""
    ref = load_quad_reference(
        "/root/reference/Reference/Data/bound/quad_reference.csv",
        reorder=True)
    qr = QuadReference(ref)
    qr.initialize(plan_dur)
    cfg = hp.HKDConfig(plan_duration=plan_dur, n_steps_max=n_steps)
    plan_np, pen_np, Xbar0, Ubar0, meta = hp.build_hkd_plan(qr, cfg)
    plan = host_plan_to_device(plan_np, dtype=dtype)
    pen = hp.pen_to_device(pen_np, dtype=dtype)
    body = np.zeros(12)
    body[5] = 0.2486
    qJ = np.array([0, -0.8, 1.6] * 4, dtype=float)
    qd = hkd.compute_hkd_state(
        jnp.asarray(body[0:3], dtype), jnp.asarray(body[3:6], dtype),
        jnp.asarray(qJ, dtype), jnp.asarray(meta["phases"][0][3], dtype))
    x0 = np.concatenate([body, np.asarray(qd)])
    return plan, pen, x0, np.asarray(Xbar0), np.asarray(Ubar0)


def batch_inputs(pen, x0, Xb, Ub, B, dtype):
    rng = np.random.default_rng(0)
    x0_b = jnp.asarray(x0[None] + rng.normal(0, 0.01, (B, x0.shape[-1])),
                       dtype)
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         pen)
    Xb_b = jnp.broadcast_to(jnp.asarray(Xb, dtype), (B,) + Xb.shape)
    Ub_b = jnp.broadcast_to(jnp.asarray(Ub, dtype), (B,) + Ub.shape)
    return pen_b, x0_b, Xb_b, Ub_b


def measure(solve, plan, batch, mesh, iters):
    plan_in = replicate(plan, mesh) if mesh is not None else plan
    batch_in = shard_batch(batch, mesh) if mesh is not None else batch
    s = solve(plan_in, *batch_in)           # warmup/compile
    np.asarray(s.cost)
    assert bool(np.asarray(s.success).all()), "solve failed"
    t0 = time.perf_counter()
    handles = []
    for _ in range(iters):
        s = solve(plan_in, *batch_in)
        handles.append((s.cost, s.success))
    for c, ok in handles:
        np.asarray(c)
        assert bool(np.asarray(ok).all())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out",
                    default=_os.path.join(REPO, "SCALING_r05.json"))
    args = ap.parse_args()
    dtype = jnp.float32
    B = args.batch

    plan, pen, x0, Xb, Ub = build(dtype)
    batch = batch_inputs(pen, x0, Xb, Ub, B, dtype)
    opts = SolverOptions(max_AL_iter=2, max_DDP_iter=1)
    kwargs = dict(trim_output=True, parallel_line_search=False,
                  max_resets=16, reg_floor=1e-3)

    points = []
    # baseline: plain vmap, one device
    solve0 = make_batched_solver(hp.make_hkd_fns(), opts, **kwargs)
    t1 = measure(solve0, plan, batch, None, args.iters)
    points.append(dict(devices=1, mesh="vmap", wall_s=round(t1, 3),
                       solves_per_s=round(B / t1, 1),
                       overhead_vs_vmap=1.0))
    print(points[-1], flush=True)

    for n in (2, 4, 8):
        mesh = scenario_mesh(n)
        solve_n = make_batched_solver(hp.make_hkd_fns(), opts, mesh=mesh,
                                      **kwargs)
        t = measure(solve_n, plan, batch, mesh, args.iters)
        points.append(dict(devices=n, mesh=f"scenario={n}",
                           wall_s=round(t, 3),
                           solves_per_s=round(B / t, 1),
                           overhead_vs_vmap=round(t / t1, 3)))
        print(points[-1], flush=True)

    # 2D mesh: scenario DP x knot-sharded backward sweep
    mesh2 = scenario_knot_mesh(2, 4)
    solve2 = make_batched_solver(hp.make_hkd_fns(), opts, mesh=mesh2,
                                 **kwargs)
    t = measure(solve2, plan, batch, mesh2, args.iters)
    points.append(dict(
        devices=8, mesh="scenario=2 x knot=4",
        wall_s=round(t, 3),
        solves_per_s=round(B / t, 1),
        overhead_vs_vmap=round(t / t1, 3),
        note="knot-sharding currently distributes ONLY the backward "
             "sweep; every knot rank redundantly computes the other "
             "stages, so on an oversubscribed host this point measures "
             "correctness-under-composition + that redundancy (8 ranks "
             "x full non-sweep work on 2 cores), not multi-chip "
             "behavior.  Its production role is the un-batched replan "
             "(B=1) and long-horizon sweeps where the sequential sweep "
             "dominates."))
    print(points[-1], flush=True)

    out = dict(
        config="hkd_112knots", total_batch=B, iters=args.iters,
        host="2-core CPU, 8 virtual devices (no real multi-chip in this "
             "image; ratios measure shard_map partitioning overhead at "
             "fixed total compute).  Scenario-DP overheads BELOW 1.0 "
             "are real: XLA CPU runs virtual devices on a shared thread "
             "pool, so sharding exposes parallelism vmap serializes.",
        points=points)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
