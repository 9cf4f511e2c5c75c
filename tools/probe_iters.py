#!/usr/bin/env python3
"""Print solver iteration telemetry for one bench-config batched solve:
how many regularization retries / line-search trials actually run."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

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

import bench as B
from cafempc_tpu.parallel.mesh import make_batched_solver

Bsz = int(os.environ.get("BENCH_BATCH", "256"))
dtype = jnp.float32
fns, opts, plan, pen, x0, Xbar0, Ubar0, metric = B.build_hkd(dtype)
rng = np.random.default_rng(0)
x0_b = jnp.asarray(x0[None] + rng.normal(0, 0.01, (Bsz, x0.shape[-1])),
                   dtype)
pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (Bsz,) + a.shape), pen)
Xb_b = jnp.broadcast_to(jnp.asarray(Xbar0, dtype), (Bsz,) + Xbar0.shape)
Ub_b = jnp.broadcast_to(jnp.asarray(Ubar0, dtype), (Bsz,) + Ubar0.shape)
solve_b = make_batched_solver(fns, opts, trim_output=True,
                              parallel_line_search=False,
                              fused_riccati=True, max_resets=16)
s = solve_b(plan, pen_b, x0_b, Xb_b, Ub_b)
jax.block_until_ready(s)
it = np.asarray(s.info.iters)
reg = np.asarray(s.info.reg_iters)
ls = np.asarray(s.info.ls_iters)
print("iters      min/med/max:", it.min(), int(np.median(it)), it.max())
print("reg_iters  min/med/max:", reg.min(), int(np.median(reg)), reg.max())
print("ls_iters   min/med/max:", ls.min(), int(np.median(ls)), ls.max())
print("success all:", bool(np.all(s.success)))
