#!/usr/bin/env python3
"""Batched scenario sweep (BASELINE.json config 5): thousands of parallel
HKD-MPC solves across gaits x initial-state perturbations x push
disturbances, on-device via vmap (+ shard_map when multiple devices are
visible).

Usage:  python tools/scenario_sweep.py [--total 4096] [--chunk 256]
Prints per-gait success statistics and aggregate throughput.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

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

from cafempc_tpu.models import hkd
from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.reference.quad_reference import (QuadReference,
                                                  load_quad_reference)
from cafempc_tpu.solver.options import load_solver_options
from cafempc_tpu.solver.plan import host_plan_to_device
from cafempc_tpu.parallel.mesh import (make_batched_solver, replicate,
                                       scenario_mesh, shard_batch)

REF_DATA = "/root/reference/Reference/Data"
GAITS = ["bound", "pace", "flypace"]


def build_gait(gait, plan_dur=1.0, n_steps_max=112, dtype=jnp.float32):
    ref = load_quad_reference(f"{REF_DATA}/{gait}/quad_reference.csv",
                              reorder=True)
    qr = QuadReference(ref)
    qr.initialize(plan_dur)
    cfg = hp.HKDConfig(plan_duration=plan_dur, n_steps_max=n_steps_max)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=256)
    args = ap.parse_args()
    dtype = jnp.float32

    import dataclasses
    opts = load_solver_options(
        "/root/reference/HKDMPC/settings/ddp_setting.info")
    opts = dataclasses.replace(opts, max_AL_iter=2, max_DDP_iter=1)

    n_dev = len(jax.devices())
    mesh = scenario_mesh() if n_dev > 1 else None
    solve_b = make_batched_solver(hp.make_hkd_fns(), opts, mesh=mesh,
                                  trim_output=True)

    rng = np.random.default_rng(0)
    per_gait = args.total // len(GAITS)
    total_done = 0
    t_all = 0.0
    print(f"devices: {n_dev}, total scenarios: {per_gait * len(GAITS)}")
    for gait in GAITS:
        plan, pen, x0, Xb, Ub = build_gait(gait, dtype=dtype)
        if mesh is not None:
            plan_in = replicate(plan, mesh)
        else:
            plan_in = plan
        n_ok = 0
        costs = []
        done = 0
        t_g = 0.0
        while done < per_gait:
            B = min(args.chunk, per_gait - done)
            B = max(B, 1)
            # scenario variation: initial-state noise + a lateral push
            # (velocity impulse), the reference's hard_push.gif scenario
            x0_b = np.tile(x0, (B, 1))
            x0_b[:, 0:12] += rng.normal(0, 0.02, (B, 12))
            x0_b[:, 9:12] += rng.normal(0, 0.25, (B, 3))   # push impulse
            pen_b = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape), pen)
            Xb_b = jnp.broadcast_to(jnp.asarray(Xb, dtype),
                                    (B,) + Xb.shape)
            Ub_b = jnp.broadcast_to(jnp.asarray(Ub, dtype),
                                    (B,) + Ub.shape)
            batch = (pen_b, jnp.asarray(x0_b, dtype), Xb_b, Ub_b)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            t0 = time.perf_counter()
            s = solve_b(plan_in, *batch)
            jax.block_until_ready(s)
            dt = time.perf_counter() - t0
            if done > 0:      # skip compile iteration in timing
                t_g += dt
            n_ok += int(jnp.sum(s.success))
            costs.append(np.asarray(s.cost))
            done += B
        cost_all = np.concatenate(costs)
        rate = (done - args.chunk) / t_g if t_g > 0 else float("nan")
        print(f"{gait:10s} ok {n_ok}/{done}  cost p50 "
              f"{np.median(cost_all):10.2f}  p95 "
              f"{np.percentile(cost_all, 95):10.2f}  "
              f"{rate:8.1f} solves/s")
        total_done += done
        t_all += t_g
    print(f"TOTAL {total_done} scenarios, steady-state "
          f"{(total_done - len(GAITS) * args.chunk) / t_all:.1f} solves/s")


if __name__ == "__main__":
    main()
