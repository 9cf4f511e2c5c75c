#!/usr/bin/env python3
"""Per-stage TPU timing of the HS-DDP solve: rollout / cost / LQ /
backward sweep (seq + parallel) / linear rollout (seq + parallel)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

def _ensure_backend():
    """JAX_PLATFORMS=axon poisons initialization when the plugin registers
    under a different discovery path; fall back to automatic selection."""
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
from cafempc_tpu.solver.hsddp import make_solver, init_traj
from cafempc_tpu.solver.options import load_solver_options
from cafempc_tpu.solver.plan import host_plan_to_device

B = int(os.environ.get("B", "512"))
dtype = jnp.float32

ref = load_quad_reference(
    "/root/reference/Reference/Data/bound/quad_reference.csv", reorder=True)
qr = QuadReference(ref)
qr.initialize(1.0)
cfg = hp.HKDConfig(plan_duration=1.0, n_steps_max=112)
plan_np, pen_np, Xbar0, Ubar0, meta = hp.build_hkd_plan(qr, cfg)
plan = host_plan_to_device(plan_np, dtype=dtype)
pen = hp.pen_to_device(pen_np, dtype=dtype)
opts = load_solver_options(
    "/root/reference/HKDMPC/settings/ddp_setting.info")
solve = make_solver(hp.make_hkd_fns(), opts)

body = np.zeros(12)
body[5] = 0.2486
qJ = np.array([0, -0.8, 1.6] * 4, dtype=float)
qd = hkd.compute_hkd_state(jnp.asarray(body[0:3], dtype),
                           jnp.asarray(body[3:6], dtype),
                           jnp.asarray(qJ, dtype),
                           jnp.asarray(meta["phases"][0][3], dtype))
x0 = jnp.asarray(np.concatenate([body, np.asarray(qd)]), dtype)

tr0 = init_traj(plan, 24, 24, 0, jnp.asarray(Xbar0, dtype),
                jnp.asarray(Ubar0, dtype), dtype)

vro = jax.jit(jax.vmap(lambda tr, x: solve._rollout(plan, tr, x, 0.5)[0],
                       in_axes=(0, 0)), donate_argnums=(0,))
vco = jax.jit(jax.vmap(lambda p_, tr: solve._compute_cost(plan, p_, tr)[0],
                       in_axes=(0, 0)))
vlq = jax.jit(jax.vmap(lambda p_, tr: solve._lq_approx(plan, p_, tr),
                       in_axes=(0, 0)), donate_argnums=(1,))
vsw = jax.jit(jax.vmap(lambda tr: solve._backward_sweep(plan, tr, 0.01)[0]),
              donate_argnums=(0,))
vswp = jax.jit(jax.vmap(
    lambda tr: solve._backward_sweep_parallel(plan, tr, 0.01)[0]),
    donate_argnums=(0,))
vswf = jax.jit(jax.vmap(
    lambda tr: solve._backward_sweep_fused(plan, tr, 0.01)[0]),
    donate_argnums=(0,))
vlr = jax.jit(jax.vmap(
    lambda tr: solve._linear_rollout(plan, tr, 1.0)[0]),
    donate_argnums=(0,))
vlrf = jax.jit(jax.vmap(
    lambda tr: solve._linear_rollout_fused(plan, tr, 1.0)[0]),
    donate_argnums=(0,))

tr_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape) + 0.0,
                    tr0)
pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape) + 0.0,
                     pen)
x0_b = jnp.broadcast_to(x0, (B, 24)) + 0.0


def bench(name, fn, *args, donated=0):
    out = fn(*args)
    jax.block_until_ready(out)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*(list(args[:donated]) + [out] + list(args[donated+1:]))) \
            if donated is not None else fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt * 1e3:9.2f} ms", flush=True)
    return out


tr_b = bench("rollout(vmap)", vro, tr_b, x0_b)
bench("compute_cost", vco, pen_b, tr_b, donated=None)
tr_b = bench("lq_approx", vlq, pen_b, tr_b, donated=1)
if os.environ.get("SKIP_SLOW_SWEEPS", "0") != "1":
    tr_b = bench("sweep_sequential", vsw, tr_b)
    tr_b = bench("sweep_parallel", vswp, tr_b)
tr_b = bench("sweep_fused", vswf, tr_b)
tr_b = bench("linear_rollout_par", vlr, tr_b)
tr_b = bench("linear_rollout_fused", vlrf, tr_b)
