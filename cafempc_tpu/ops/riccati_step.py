"""Fused lane-batched Riccati backward step (Pallas).

One DDP backward-sweep step (SinglePhase.cpp:334-386) as a single kernel
over lane-batched operands: the Q-expansion, regularization, Cholesky of
Quu, gains, and value-function update all happen in VMEM at full lane
width — no HBM round-trips between the small-matrix ops and no XLA
small-decomposition lowering.

This is the inner building block of the fused N-step sweep kernel
(docs/PERF.md roadmap #1); the full sweep adds an in-kernel loop over
knots with double-buffered DMA of the per-knot operands.

Layout: matrices [r, c, L], vectors [r, L]; L = lane batch (mult. of 128).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cafempc_tpu.ops.lane_batched import _interpret


def _matmul_TN(X, Y, r, k):
    """X^T Y for lane-batched X [k, r, L], Y [k, c, L] -> [r, c, L]."""
    out = None
    for j in range(k):
        term = X[j:j + 1, :, :].swapaxes(0, 1) * Y[j:j + 1, :, :]
        out = term if out is None else out + term
    return out


def _matvec_T(X, v, r, k):
    """X^T v for X [k, r, L], v [k, L] -> [r, L]."""
    out = None
    for j in range(k):
        term = X[j, :, :] * v[j][None, :]
        out = term if out is None else out + term
    return out


def _riccati_step_kernel(xs, us):
    def kernel(A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
               G1_ref, H1_ref, d_ref, reg_ref,
               G_ref, H_ref, K_ref, dU_ref, Qu_ref, Quu_ref, Qux_ref,
               ok_ref):
        A = A_ref[:]          # [xs, xs, L]
        Bm = B_ref[:]         # [xs, us, L]
        lx = lx_ref[:]        # [xs, L]
        lu = lu_ref[:]        # [us, L]
        lxx = lxx_ref[:]
        luu = luu_ref[:]
        lux = lux_ref[:]      # [us, xs, L]
        G1 = G1_ref[:]        # [xs, L]
        H1 = H1_ref[:]        # [xs, xs, L]
        dft = d_ref[:]        # [xs, L]
        reg = reg_ref[0, 0]

        # Gc = G' + H' defect
        Gc = G1 + sum(H1[:, j, :] * dft[j][None, :] for j in range(xs))

        # H' A and H' B (H' symmetric, so H'^T X == H' X)
        HA = _matmul_TN(H1, A, xs, xs)
        HB = _matmul_TN(H1, Bm, xs, xs)

        Qx = lx + _matvec_T(A, [Gc[j] for j in range(xs)], xs, xs)
        Qu = lu + _matvec_T(Bm, [Gc[j] for j in range(xs)], us, xs)
        Qxx = lxx + _matmul_TN(A, HA, xs, xs)
        Quu = luu + _matmul_TN(Bm, HB, us, xs)
        Qux = lux + _matmul_TN(Bm, HA, us, xs)

        def _eye(n, dtype):
            ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            return (ri == ci).astype(dtype)

        Qxx = Qxx + reg * _eye(xs, Qxx.dtype)[:, :, None]
        Qxx = 0.5 * (Qxx + Qxx.swapaxes(0, 1))
        Quu = Quu + reg * _eye(us, Quu.dtype)[:, :, None]

        # lane-wise Cholesky of Quu (with the reference's -1e-9 shift for
        # the PSD check)
        col = []
        ok = jnp.ones_like(Quu[0, 0, :])
        for j in range(us):
            d = Quu[j, j, :] - 1e-9
            for k in range(j):
                d = d - col[k][j] * col[k][j]
            ok = ok * (d > 0.0)
            dj = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
            cj = []
            for i in range(us):
                if i < j:
                    cj.append(jnp.zeros_like(d))
                else:
                    v = Quu[i, j, :]
                    for k in range(j):
                        v = v - col[k][i] * col[k][j]
                    cj.append(v * dj)
            col.append(cj)

        def cho_solve_cols(rhs_cols):
            """Solve Quu X = rhs for a list of column vectors (each a list
            of [L] rows)."""
            out_cols = []
            for rc in rhs_cols:
                y = []
                for i in range(us):
                    v = rc[i]
                    for k in range(i):
                        v = v - col[k][i] * y[k]
                    y.append(v * jax.lax.reciprocal(col[i][i]))
                x = [None] * us
                for i in reversed(range(us)):
                    v = y[i]
                    for k in range(i + 1, us):
                        v = v - col[i][k] * x[k]
                    x[i] = v * jax.lax.reciprocal(col[i][i])
                out_cols.append(x)
            return out_cols

        # dU = -Quu^-1 Qu ; K = -Quu^-1 Qux
        (dU_cols,) = cho_solve_cols([[Qu[i] for i in range(us)]])
        K_cols = cho_solve_cols(
            [[Qux[i, c, :] for i in range(us)] for c in range(xs)])
        dU = jnp.concatenate([(-dU_cols[i])[None, :] for i in range(us)], 0)
        K = jnp.concatenate(
            [jnp.concatenate([(-K_cols[c][i])[None, None, :]
                              for c in range(xs)], axis=1)
             for i in range(us)], axis=0)

        # G = Qx + Qux^T dU ; H = Qxx + Qux^T K
        G = Qx + _matvec_T(Qux, [dU[j] for j in range(us)], xs, us)
        H = Qxx + _matmul_TN(Qux, K, xs, us)
        H = 0.5 * (H + H.swapaxes(0, 1))

        G_ref[:] = G
        H_ref[:] = H
        K_ref[:] = K
        dU_ref[:] = dU
        Qu_ref[:] = Qu
        Quu_ref[:] = Quu
        Qux_ref[:] = Qux
        ok_ref[:] = ok[None, :]
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l",))
def riccati_step(A, B, lx, lu, lxx, luu, lux, G1, H1, defect, reg,
                 block_l=128):
    """Fused backward step.  Shapes: A [xs,xs,L], B [xs,us,L], lx [xs,L],
    lu [us,L], lxx [xs,xs,L], luu [us,us,L], lux [us,xs,L], G1 [xs,L],
    H1 [xs,xs,L], defect [xs,L], reg scalar.
    Returns (G, H, K, dU, Qu, Quu, Qux, ok)."""
    xs, us, L = A.shape[0], B.shape[1], A.shape[2]
    assert L % block_l == 0
    dt = A.dtype

    def mat(r, c):
        return pl.BlockSpec((r, c, block_l), lambda l: (0, 0, l),
                            memory_space=pltpu.VMEM)

    def vec(r):
        return pl.BlockSpec((r, block_l), lambda l: (0, l),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((1, 1), lambda l: (0, 0),
                        memory_space=pltpu.SMEM)
    reg_arr = jnp.asarray(reg, dt).reshape(1, 1)
    out_shapes = (
        jax.ShapeDtypeStruct((xs, L), dt),          # G
        jax.ShapeDtypeStruct((xs, xs, L), dt),      # H
        jax.ShapeDtypeStruct((us, xs, L), dt),      # K
        jax.ShapeDtypeStruct((us, L), dt),          # dU
        jax.ShapeDtypeStruct((us, L), dt),          # Qu
        jax.ShapeDtypeStruct((us, us, L), dt),      # Quu
        jax.ShapeDtypeStruct((us, xs, L), dt),      # Qux
        jax.ShapeDtypeStruct((1, L), dt),           # ok
    )
    out_specs = (vec(xs), mat(xs, xs), mat(us, xs), vec(us), vec(us),
                 mat(us, us), mat(us, xs), vec(1))
    return pl.pallas_call(
        _riccati_step_kernel(xs, us),
        out_shape=out_shapes,
        grid=(L // block_l,),
        in_specs=[mat(xs, xs), mat(xs, us), vec(xs), vec(us),
                  mat(xs, xs), mat(us, us), mat(us, xs), vec(xs),
                  mat(xs, xs), vec(xs), smem],
        out_specs=out_specs,
        interpret=_interpret())(
        A, B, lx, lu, lxx, luu, lux, G1, H1, defect, reg_arr)
