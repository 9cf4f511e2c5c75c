#!/usr/bin/env python3
"""Micro-benchmark: Riccati-like scan of batched 24x24 matrix products in
batch-FIRST ([N,B,n,n], the vmap-natural layout — pads n=24 lanes to 128,
5.3x waste) vs batch-LAST ([N,n,n,B] — puts the wide batch axis on the
lanes).  Informs the solver's storage layout choice."""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")

N, B, n = 112, 512, 24
key = jax.random.PRNGKey(0)
A_bf = jax.random.normal(key, (N, B, n, n), jnp.float32) * 0.1
A_bl = jnp.transpose(A_bf, (0, 2, 3, 1))
H0_bf = jnp.eye(n, dtype=jnp.float32)[None].repeat(B, 0)
H0_bl = jnp.transpose(H0_bf, (1, 2, 0))


@jax.jit
def sweep_bf(A, H0):
    def step(H, Ak):
        H = jnp.einsum("bji,bjk,bkl->bil", Ak, H, Ak)
        return H, jnp.trace(H, axis1=-2, axis2=-1)
    H, tr = jax.lax.scan(step, H0, A, reverse=True)
    return tr


@jax.jit
def sweep_bl(A, H0):
    def step(H, Ak):
        H = jnp.einsum("jib,jkb,klb->ilb", Ak, H, Ak)
        return H, jnp.einsum("iib->b", H)
    H, tr = jax.lax.scan(step, H0, A, reverse=True)
    return tr


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")


bench("batch-first [N,B,n,n]", sweep_bf, A_bf, H0_bf)
bench("batch-last  [N,n,n,B]", sweep_bl, A_bl, H0_bl)
