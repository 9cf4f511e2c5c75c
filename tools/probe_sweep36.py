#!/usr/bin/env python3
"""Probe: fused backward sweep at the MHPC cascade width (xs=36, us=12)
on the real TPU — checks VMEM fit + timing per block_l.

Usage: python tools/probe_sweep36.py [block_l ...]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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

from cafempc_tpu.ops.fused_sweep import fused_backward_sweep


def main():
    blocks = [int(a) for a in sys.argv[1:2]] or [128]
    xs = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    us = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    L = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    rng = np.random.default_rng(0)
    dt = jnp.float32

    def mk(*shape):
        return jnp.asarray(rng.normal(0, 0.1, shape), dt)

    A = mk(N, xs, xs, L)
    B = mk(N, xs, us, L)
    lx = mk(N, xs, L)
    lu = mk(N, us, L)
    lxx = jnp.broadcast_to(2.0 * jnp.eye(xs, dtype=dt)[None, :, :, None],
                           (N, xs, xs, L)) + 0.0
    luu = jnp.broadcast_to(2.0 * jnp.eye(us, dtype=dt)[None, :, :, None],
                           (N, us, us, L)) + 0.0
    lux = mk(N, us, xs, L) * 0.01
    phix = mk(N + 1, xs, L)
    phixx = jnp.broadcast_to(jnp.eye(xs, dtype=dt)[None, :, :, None],
                             (N + 1, xs, xs, L)) + 0.0
    defect = mk(N + 1, xs, L) * 0.01
    w = np.zeros(N, np.int32)
    w[min(10, N - 1)] = 1
    reg = jnp.full((L,), 1e-3, dt)

    for bl in blocks:
        try:
            t0 = time.perf_counter()
            out = fused_backward_sweep(A, B, lx, lu, lxx, luu, lux, phix,
                                       phixx, defect, w, reg, block_l=bl)
            jax.block_until_ready(out)
            t1 = time.perf_counter()
            for _ in range(10):
                out = fused_backward_sweep(A, B, lx, lu, lxx, luu, lux,
                                           phix, phixx, defect, w, reg,
                                           block_l=bl)
            jax.block_until_ready(out)
            t2 = time.perf_counter()
            print(f"block_l={bl}: compile+run {t1-t0:.1f}s, "
                  f"steady {(t2-t1)/10*1e3:.2f} ms, "
                  f"ok={np.asarray(out[7])[0, :3]}")
        except Exception as e:
            print(f"block_l={bl}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}")


if __name__ == "__main__":
    main()
