#!/usr/bin/env python3
"""Micro-profile the pieces of lq_approx on TPU: dynamics partials vs
cost partials vs constraint/ReB partials."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

def _ensure_backend():
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
_ensure_backend()

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.reference.quad_reference import (QuadReference,
                                                  load_quad_reference)
from cafempc_tpu.solver import penalty
from cafempc_tpu.solver.plan import host_plan_to_device

B = int(os.environ.get("B", "256"))
dtype = jnp.float32

ref = load_quad_reference(
    "/root/reference/Reference/Data/bound/quad_reference.csv", reorder=True)
qr = QuadReference(ref)
qr.initialize(1.0)
cfg = hp.HKDConfig(plan_duration=1.0, n_steps_max=112)
plan_np, pen_np, Xbar0, Ubar0, meta = hp.build_hkd_plan(qr, cfg)
plan = host_plan_to_device(plan_np, dtype=dtype)
pen = hp.pen_to_device(pen_np, dtype=dtype)
fns = hp.make_hkd_fns()

N = plan.step.active.shape[0]
X = jnp.broadcast_to(jnp.asarray(Xbar0, dtype), (B,) + Xbar0.shape) + 0.0
U = jnp.broadcast_to(jnp.asarray(Ubar0, dtype), (B,) + Ubar0.shape) + 0.0
Y = jnp.zeros((B, N, 0), dtype)
pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape) + 0.0,
                     pen)
sd = plan.step


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


vv = lambda f: jax.jit(jax.vmap(jax.vmap(f, in_axes=(0, 0, None)),
                                in_axes=(0, 0, None)))

dynp = jax.jit(jax.vmap(
    lambda Xb, Ub: jax.vmap(fns.dyn_partials)(Xb[:-1], Ub, sd)))
rcp = jax.jit(jax.vmap(
    lambda Xb, Ub, Yb: jax.vmap(fns.run_cost_partials)(Xb[:-1], Ub, Yb,
                                                       sd)))
resetp = jax.jit(jax.vmap(
    lambda Xb: jax.vmap(fns.reset_partial)(Xb[:-1], sd)))
tcp = jax.jit(jax.vmap(
    lambda Xb: jax.vmap(fns.term_cost_partials)(Xb, plan.knot)))


def reb_part(Xb, Ub, Yb, p):
    g = jax.vmap(fns.path_con)(Xb[:-1], Ub, Yb, sd)
    gx, gu, gy = jax.vmap(fns.path_con_partials)(Xb[:-1], Ub, Yb, sd)
    return jax.vmap(penalty.reb_partials)(g, gx, gu, gy, p.reb_delta,
                                          p.reb_eps, p.reb_active)


rebp = jax.jit(jax.vmap(reb_part))

bench("dyn_partials", dynp, X, U)
bench("reset_partial", resetp, X)
bench("run_cost_partials", rcp, X, U, Y)
bench("term_cost_partials", tcp, X)
bench("reb_partials(+path_con)", rebp, X, U, Y, pen_b)
