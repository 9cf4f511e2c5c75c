#!/usr/bin/env python3
"""Break lq_approx into sub-parts and time each on the TPU (HKD config,
closed-form partials).  Identifies which vmapped callable dominates."""
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

from cafempc_tpu.models import hkd
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
sd = plan.step
kd = plan.knot

X = jnp.broadcast_to(jnp.asarray(Xbar0, dtype), (B,) + Xbar0.shape) + 0.0
U = jnp.broadcast_to(jnp.asarray(Ubar0, dtype), (B,) + Ubar0.shape) + 0.0
Y = jnp.zeros((B, Ubar0.shape[0], 0), dtype)
pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape) + 0.0,
                     pen)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:9.2f} ms", flush=True)


# 1. dynamics partials (closed form)
bench("dyn_partials", jax.vmap(
    lambda Xb_, Ub_: jax.vmap(fns.dyn_partials)(Xb_[:-1], Ub_, sd)), X, U)

# 2. reset partials over every knot (the pre-gather behavior)
bench("reset_partial_all", jax.vmap(
    lambda Xb_: jax.vmap(fns.reset_partial)(Xb_[:-1], sd)), X)

# 3. run-cost partials
bench("run_cost_partials", jax.vmap(
    lambda Xb_, Ub_, Yb_: jax.vmap(fns.run_cost_partials)(
        Xb_[:-1], Ub_, Yb_, sd)), X, U, Y)

# 4. path constraints + partials + ReB folding
def reb_part(Xb_, Ub_, Yb_, pen_):
    g = jax.vmap(fns.path_con)(Xb_[:-1], Ub_, Yb_, sd)
    gx, gu, gy = jax.vmap(fns.path_con_partials)(Xb_[:-1], Ub_, Yb_, sd)
    return jax.vmap(penalty.reb_partials)(
        g, gx, gu, gy, pen_.reb_delta, pen_.reb_eps, pen_.reb_active)
bench("pathcon+reb_partials", jax.vmap(reb_part), X, U, Y, pen_b)

# 5. terminal cost partials
bench("term_cost_partials", jax.vmap(
    lambda Xb_: jax.vmap(fns.term_cost_partials)(Xb_, kd)), X)

# 6. terminal constraints + partials + AL
def al_part(Xb_, pen_):
    h = jax.vmap(fns.term_con)(Xb_, kd)
    hx = jax.vmap(fns.term_con_partials)(Xb_, kd)
    return jax.vmap(penalty.al_partials)(
        h, hx, pen_.al_lambda, pen_.al_sigma, pen_.al_active)
bench("termcon+al_partials", jax.vmap(al_part), X, pen_b)

# 6a-6c: finer split
bench("term_con only", jax.vmap(
    lambda Xb_: jax.vmap(fns.term_con)(Xb_, kd)), X)
bench("term_con_partials only", jax.vmap(
    lambda Xb_: jax.vmap(fns.term_con_partials)(Xb_, kd)), X)
h_b = jax.jit(jax.vmap(lambda Xb_: jax.vmap(fns.term_con)(Xb_, kd)))(X)
hx_b = jax.jit(jax.vmap(
    lambda Xb_: jax.vmap(fns.term_con_partials)(Xb_, kd)))(X)
bench("al_partials only", jax.vmap(
    lambda h_, hx_, pen_: jax.vmap(penalty.al_partials)(
        h_, hx_, pen_.al_lambda, pen_.al_sigma, pen_.al_active)),
    h_b, hx_b, pen_b)
