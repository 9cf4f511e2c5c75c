#!/usr/bin/env python3
"""Diagnose the 'regularized sweep runs twice per DDP iteration' finding.

Runs the bench HKD config on CPU at small batch, comparing reg_iters
(total regularization sweep attempts over the solve) across:
  - fused Pallas sweep (interpret mode on CPU) vs the lax.scan sweep
  - f32 (production numerics) vs f64

If the non-fused f64 path also needs 2 attempts per DDP iteration the
PSD failure at reg=0 is genuine (indefinite Quu on the cold bound
problem); if only f32/fused shows it, it is a numerical-margin artifact.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import bench as B
from cafempc_tpu.parallel.mesh import make_batched_solver

Bsz = int(os.environ.get("BENCH_BATCH", "4"))


def run(dtype, fused):
    fns, opts, plan, pen, x0, Xbar0, Ubar0, metric = B.build_hkd(dtype)
    rng = np.random.default_rng(0)
    x0_b = jnp.asarray(x0[None] + rng.normal(0, 0.01, (Bsz, x0.shape[-1])),
                       dtype)
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (Bsz,) + a.shape), pen)
    Xb_b = jnp.broadcast_to(jnp.asarray(Xbar0, dtype), (Bsz,) + Xbar0.shape)
    Ub_b = jnp.broadcast_to(jnp.asarray(Ubar0, dtype), (Bsz,) + Ubar0.shape)
    solve_b = make_batched_solver(fns, opts, trim_output=True,
                                  parallel_line_search=False,
                                  fused_riccati=fused, max_resets=16)
    s = solve_b(plan, pen_b, x0_b, Xb_b, Ub_b)
    jax.block_until_ready(s)
    it = np.asarray(s.info.iters)
    reg = np.asarray(s.info.reg_iters)
    ls = np.asarray(s.info.ls_iters)
    print(f"dtype={dtype.__name__} fused={fused}: "
          f"iters={it.tolist()} reg_iters={reg.tolist()} "
          f"ls_iters={ls.tolist()} success={np.asarray(s.success).tolist()}",
          flush=True)


if __name__ == "__main__":
    # f32 must run WITHOUT x64 (production numerics): mixing f32 plans
    # with x64-strong numpy constants trips dtype promotion in the scan
    # carries.  Run f32 in a separate process with x64 off if needed;
    # in-process we probe f64 on both sweep implementations.
    for dtype in (jnp.float64,):
        for fused in (False, True):
            run(dtype, fused)
