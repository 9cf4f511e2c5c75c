#!/usr/bin/env python3
"""Per-stage TPU timing of the MHPC cascade solve at the bench
configuration: rollout / cost terms / segmented LQ / fused backward
sweep / fused linear rollout.  Standalone-jit timings overstate
in-program costs (dispatch overhead) but rank the stages."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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

import bench
from cafempc_tpu.solver.hsddp import init_traj, make_solver

B = int(os.environ.get("B", "64"))
dtype = jnp.float32

fns, opts, plan, pen, x0, Xb, Ub, metric = bench.build_mhpc(dtype)
solve = make_solver(fns, opts, max_resets=16, fused_riccati=True,
                    reg_floor=1e-3, parallel_line_search=False)

rng = np.random.default_rng(0)
x0_b = jnp.asarray(np.asarray(x0)[None]
                   + rng.normal(0, 0.01, (B, x0.shape[-1])), dtype)
pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), pen)
Xb_b = jnp.broadcast_to(jnp.asarray(Xb, dtype), (B,) + np.shape(Xb))
Ub_b = jnp.broadcast_to(jnp.asarray(Ub, dtype), (B,) + np.shape(Ub))

tr0 = jax.vmap(lambda xb, ub: init_traj(plan, 36, 12, 12, xb, ub, dtype))(
    Xb_b, Ub_b)


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:9.2f} ms")
    return out


roll = timeit("rollout (vmap MS)",
              jax.vmap(lambda t, x: solve._rollout(plan, t, x, 0.0)[0]),
              tr0, x0_b)
timeit("cost (terms + fold)",
       jax.vmap(lambda p_, t: solve._compute_cost(plan, p_, t)),
       pen_b, roll)
lq = timeit("LQ approx (segmented)",
            jax.vmap(lambda p_, t: solve._lq_approx(plan, p_, t)),
            pen_b, roll)
reg_b = jnp.full((B,), 1e-3, dtype)
timeit("fused backward sweep",
       jax.vmap(lambda t, r: solve._backward_sweep_fused(plan, t, r)[0],
                in_axes=(0, 0)),
       lq, reg_b)
sw = jax.vmap(lambda t, r: solve._backward_sweep_fused(plan, t, r)[0],
              in_axes=(0, 0))(lq, reg_b)
timeit("fused linear rollout",
       jax.vmap(lambda t: solve._linear_rollout_fused(plan, t, 1.0)[0]),
       sw)
