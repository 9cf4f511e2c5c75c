"""Pallas TPU primitives for lane-batched small-matrix algebra.

Groundwork for the fused Riccati-sweep kernel (docs/PERF.md roadmap #1):
the HS-DDP inner loops are dense algebra on tiny (12-36 dim) matrices
batched over thousands of scenarios.  XLA's native handling pads the
matrix dims onto the 128-wide lanes (5.3x waste) and lowers per-matrix
Cholesky/solves poorly.  These kernels instead put the SCENARIO batch on
the lanes — each matrix entry is a [L]-vector across scenarios — so every
operation is a dense VPU op at full width.

Layout convention: a lane-batched matrix stack is [n, n, L] (L = lane
batch, multiple of 128); `A[i, j, :]` is entry (i,j) across scenarios.

Provided:
  * lb_gram(A, H):        A^T H A            (the Riccati H-propagation)
  * lb_cholesky(S):       lower Cholesky of SPD S
  * lb_cho_solve(Lc, B):  solve (Lc Lc^T) X = B
All are single Pallas kernels with python-unrolled n-loops (n <= 64).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    """Pallas interpret mode on non-TPU backends (CPU test path)."""
    return jax.default_backend() != "tpu"


def _gram_kernel(n):
    def kernel(a_ref, h_ref, out_ref):
        # out = A^T H A, one [n,n,L] tile per program
        A = a_ref[:]          # [n, n, L]
        H = h_ref[:]
        # M = H A:  M[j,k,l] = sum_i H[j,i,l] A[i,k,l]
        M = jnp.zeros_like(A)
        for i in range(n):
            M += H[:, i:i + 1, :] * A[i:i + 1, :, :]
        # out[i,k,l] = sum_j A[j,i,l] M[j,k,l]
        out = jnp.zeros_like(A)
        for j in range(n):
            out += A[j:j + 1, :, :].swapaxes(0, 1) * M[j:j + 1, :, :]
        out_ref[:] = out
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l",))
def lb_gram(A, H, block_l=128):
    """A^T H A for lane-batched stacks [n, n, L]."""
    n, _, L = A.shape
    assert L % block_l == 0
    grid = (L // block_l,)
    spec = pl.BlockSpec((n, n, block_l), lambda l: (0, 0, l),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gram_kernel(n),
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        grid=grid, in_specs=[spec, spec], out_specs=spec,
        interpret=_interpret())(A, H)


def _chol_kernel(n):
    def kernel(s_ref, out_ref):
        S = s_ref[:]                       # [n, n, L]
        Lc = jnp.zeros_like(S)
        col = []
        for j in range(n):
            # d = S[j,j] - sum_k Lc[j,k]^2
            d = S[j, j, :]
            for k in range(j):
                d = d - col[k][j] * col[k][j]
            dj = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
            cj = []
            for i in range(n):
                if i < j:
                    cj.append(jnp.zeros_like(d))
                else:
                    v = S[i, j, :]
                    for k in range(j):
                        v = v - col[k][i] * col[k][j]
                    cj.append(v * dj)
            col.append(cj)
        out = jnp.stack([jnp.stack([col[j][i] for j in range(n)], axis=0)
                         for i in range(n)], axis=0)
        out_ref[:] = out
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l",))
def lb_cholesky(S, block_l=128):
    """Lower Cholesky factor of SPD lane-batched stacks [n, n, L]."""
    n, _, L = S.shape
    assert L % block_l == 0
    spec = pl.BlockSpec((n, n, block_l), lambda l: (0, 0, l),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chol_kernel(n),
        out_shape=jax.ShapeDtypeStruct(S.shape, S.dtype),
        grid=(L // block_l,), in_specs=[spec], out_specs=spec,
        interpret=_interpret())(S)


def _cho_solve_kernel(n, m):
    def kernel(l_ref, b_ref, out_ref):
        Lc = l_ref[:]        # [n, n, L]
        B = b_ref[:]         # [n, m, L]
        # forward solve L y = b
        y = []
        for i in range(n):
            v = B[i, :, :]
            for k in range(i):
                v = v - Lc[i, k, :][None, :] * y[k]
            y.append(v / Lc[i, i, :][None, :])
        # backward solve L^T x = y
        x = [None] * n
        for i in reversed(range(n)):
            v = y[i]
            for k in range(i + 1, n):
                v = v - Lc[k, i, :][None, :] * x[k]
            x[i] = v / Lc[i, i, :][None, :]
        out_ref[:] = jnp.stack(x, axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l",))
def lb_cho_solve(Lc, B, block_l=128):
    """Solve (Lc Lc^T) X = B; Lc [n,n,L] lower, B [n,m,L]."""
    n, _, L = Lc.shape
    m = B.shape[1]
    assert L % block_l == 0
    spec_l = pl.BlockSpec((n, n, block_l), lambda l: (0, 0, l),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((n, m, block_l), lambda l: (0, 0, l),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _cho_solve_kernel(n, m),
        out_shape=jax.ShapeDtypeStruct(B.shape, B.dtype),
        grid=(L // block_l,), in_specs=[spec_l, spec_b],
        out_specs=spec_b, interpret=_interpret())(Lc, B)
