"""Fully fused lane-batched HS-DDP backward sweep (Pallas).

The entire N-step Riccati recursion — Q-expansion with defect correction,
regularization, lane-wise Cholesky PSD check, gains, impact-aware
reset/padding transforms, and the dV accumulators — runs as ONE kernel:
grid = (lane_blocks, N) with the (G, H) carry in VMEM scratch across the
sequential knot dimension and the per-knot operands streamed from HBM by
the pallas pipeline.  This removes both the per-step dispatch overhead of
`lax.scan` and XLA's small-matrix decomposition lowering (docs/PERF.md
roadmap #1).

Semantics mirror solver/hsddp.backward_sweep exactly (which itself mirrors
SinglePhase.cpp:323-391 + MultiPhaseDDP.cpp:174-213): per step k
(processed in reverse),
  dynamics step (w=0):   standard Q-expansion from (G', H') with
                         Gn = G' + H' defect, Cholesky(Quu - 1e-9 I) PSD
                         check, K/dU/value update, dV accumulation;
  transform step (w=1):  G = phix + A^T Gn, H = phixx + A^T H' A
                         (A holds the reset-map partial Px; padding steps
                         have A = 0).

Because a step is EITHER a dynamics step (reads lx/lxx) OR a transform
step (reads phix/phixx), the caller passes ONE merged cost stream
(lx := where(w, phix, lx), lxx := where(w, phixx, lxx)) and the kernel's
transform branch is just the Q-expansion base before regularization —
one fewer xs*xs operand stream, which is what fits the 36-state cascade
under the 16MB scoped-VMEM limit.

Layout: operands knot-major, lane-minor: A [N,xs,xs,L], lx [N,xs,L], ...;
L is the scenario lane batch (multiple of 128).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cafempc_tpu.ops.common import _interpret


def _eye(n, dtype):
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ri == ci).astype(dtype)


def _mm_TN(X, Y, k):
    """X^T Y for [k, r, L] x [k, c, L] -> [r, c, L]."""
    out = None
    for j in range(k):
        term = X[j:j + 1, :, :].swapaxes(0, 1) * Y[j:j + 1, :, :]
        out = term if out is None else out + term
    return out


def _mv_T(X, v, k):
    """X^T v for [k, r, L] x [k, L] -> [r, L]."""
    out = None
    for j in range(k):
        term = X[j, :, :] * v[j][None, :]
        out = term if out is None else out + term
    return out


def _sweep_kernel(xs, us, n_steps):
    def kernel(w_ref, reg_ref,
               A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
               d_ref, phixT_ref, phixxT_ref,
               G_ref, H_ref, K_ref, dU_ref, Qu_ref, Quu_ref, Qux_ref,
               ok_ref, dv_ref,
               Gc_s, Hc_s, ok_s, dv1_s, dv2_s):
        k_rev = pl.program_id(1)           # 0 .. n_steps-1 (reverse walk)
        step = n_steps - 1 - k_rev
        w = w_ref[step]                    # 1 = transform/padding step
        reg = reg_ref[0]                   # per-lane regularization [L]

        @pl.when(k_rev == 0)
        def _init():
            Gc_s[:] = phixT_ref[:]
            Hc_s[:] = phixxT_ref[:]
            ok_s[:] = jnp.ones_like(ok_s)
            dv1_s[:] = jnp.zeros_like(dv1_s)
            dv2_s[:] = jnp.zeros_like(dv2_s)

        A = A_ref[0]
        Bm = B_ref[0]
        lx = lx_ref[0]                     # merged: phix on transform steps
        lu = lu_ref[0]
        lxx = lxx_ref[0]                   # merged: phixx on transform steps
        luu = luu_ref[0]
        lux = lux_ref[0]
        dft = d_ref[0]
        G1 = Gc_s[:]
        H1 = Hc_s[:]

        # defect-corrected gradient
        Gn = G1 + sum(H1[:, j, :] * dft[j][None, :] for j in range(xs))

        HA = _mm_TN(H1, A, xs)             # H' A  (H' symmetric)
        AtHA = _mm_TN(A, HA, xs)
        AtGn = _mv_T(A, [Gn[j] for j in range(xs)], xs)

        # shared Q-expansion base; with the merged cost streams the
        # transform branch (G = phix + A^T Gn, H = phixx + A^T H' A) is
        # exactly this base before regularization
        Qx = lx + AtGn
        Qxx_base = lxx + AtHA
        G_tr = Qx
        H_tr = Qxx_base

        # ---- dynamics branch
        HB = _mm_TN(H1, Bm, xs)
        Qu = lu + _mv_T(Bm, [Gn[j] for j in range(xs)], xs)
        Qxx = Qxx_base + _eye(xs, A.dtype)[:, :, None] * reg[None, None, :]
        Qxx = 0.5 * (Qxx + Qxx.swapaxes(0, 1))
        Quu = (luu + _mm_TN(Bm, HB, xs)
               + _eye(us, A.dtype)[:, :, None] * reg[None, None, :])
        Qux = lux + _mm_TN(Bm, HA, xs)

        # lane-wise Cholesky of (Quu - 1e-9 I) with PSD flag
        col = []
        ok_k = jnp.ones_like(Quu[0, 0, :])
        for j in range(us):
            d = Quu[j, j, :] - 1e-9
            for k2 in range(j):
                d = d - col[k2][j] * col[k2][j]
            ok_k = ok_k * (d > 0.0).astype(d.dtype)
            dj = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
            cj = []
            for i in range(us):
                if i < j:
                    cj.append(jnp.zeros_like(d))
                else:
                    v = Quu[i, j, :]
                    for k2 in range(j):
                        v = v - col[k2][i] * col[k2][j]
                    cj.append(v * dj)
            col.append(cj)

        def cho_solve_cols(rhs_cols):
            out_cols = []
            for rc in rhs_cols:
                y = []
                for i in range(us):
                    v = rc[i]
                    for k2 in range(i):
                        v = v - col[k2][i] * y[k2]
                    y.append(v * jax.lax.reciprocal(col[i][i]))
                x = [None] * us
                for i in reversed(range(us)):
                    v = y[i]
                    for k2 in range(i + 1, us):
                        v = v - col[i][k2] * x[k2]
                    x[i] = v * jax.lax.reciprocal(col[i][i])
                out_cols.append(x)
            return out_cols

        (dU_cols,) = cho_solve_cols([[Qu[i] for i in range(us)]])
        K_cols = cho_solve_cols(
            [[Qux[i, c, :] for i in range(us)] for c in range(xs)])
        dU = jnp.concatenate([(-dU_cols[i])[None, :] for i in range(us)], 0)
        K = jnp.concatenate(
            [jnp.concatenate([(-K_cols[c][i])[None, None, :]
                              for c in range(xs)], axis=1)
             for i in range(us)], axis=0)

        G_dyn = Qx + _mv_T(Qux, [dU[j] for j in range(us)], us)
        H_dyn = Qxx + _mm_TN(Qux, K, us)
        H_dyn = 0.5 * (H_dyn + H_dyn.swapaxes(0, 1))

        wf = (w > 0).astype(A.dtype)
        G_new = wf * G_tr + (1.0 - wf) * G_dyn
        H_new = wf * H_tr + (1.0 - wf) * H_dyn

        dv_k = (1.0 - wf) * sum(Qu[i] * dU[i] for i in range(us))
        dv1_s[:] = dv1_s[:] + dv_k[None, :]       # dV1 -= -Qu dU = +Qu dU
        dv2_s[:] = dv2_s[:] - dv_k[None, :]       # dV2 += -Qu dU
        ok_s[:] = ok_s[:] * jnp.maximum(ok_k, wf)[None, :]

        Gc_s[:] = G_new
        Hc_s[:] = H_new

        zf = (1.0 - wf)
        G_ref[0] = G_new
        H_ref[0] = H_new
        K_ref[0] = K * zf
        dU_ref[0] = dU * zf
        Qu_ref[0] = Qu * zf
        Quu_ref[0] = Quu * zf + wf * _eye(us, A.dtype)[:, :, None]
        Qux_ref[0] = Qux * zf

        @pl.when(k_rev == n_steps - 1)
        def _finalize():
            ok_ref[:] = ok_s[:]
            dv_ref[0] = dv1_s[0]
            dv_ref[1] = dv2_s[0]
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l",))
def fused_backward_sweep(A, B, lx, lu, lxx, luu, lux, phix_term,
                         phixx_term, defect, w, reg, block_l=128):
    """Fused N-step backward sweep over lane-batched operands.

    Shapes (N steps, L lanes): A [N,xs,xs,L], B [N,xs,us,L], lx [N,xs,L],
    lu [N,us,L], lxx [N,xs,xs,L], luu [N,us,us,L], lux [N,us,xs,L],
    phix_term [xs,L] / phixx_term [xs,xs,L] (terminal-knot cost),
    defect [N+1,xs,L] (entry k+1 is the defect used at step k), w [N]
    int32 transform flags, reg [L] per-lane regularization (keeps the
    cost-Hessian operands independent of the regularization retry loop so
    XLA hoists their lane-layout transposes out of the while body).

    lx/lxx are the MERGED cost streams: the caller selects
    where(w, phix[k], lx[k]) / where(w, phixx[k], lxx[k]) per step, since
    transform steps read only phix/phixx and dynamics steps only lx/lxx.

    Returns (G [N,xs,L] for knots 0..N-1, H [N,xs,xs,L], K [N,us,xs,L],
    dU, Qu, Quu, Qux, ok [1,L], dv [2,L] = (sum QudU, -sum QudU)).
    The caller appends the terminal knot (phix[N], phixx[N]) and applies
    the G[0] defect correction.
    """
    N, xs = A.shape[0], A.shape[1]
    us = B.shape[2]
    L = A.shape[3]
    assert L % block_l == 0
    dt = A.dtype
    n_lb = L // block_l

    def step_mat(r, c):
        return pl.BlockSpec((1, r, c, block_l),
                            lambda lb, k, *_: (N - 1 - k, 0, 0, lb),
                            memory_space=pltpu.VMEM)

    def step_vec(r):
        return pl.BlockSpec((1, r, block_l),
                            lambda lb, k, *_: (N - 1 - k, 0, lb),
                            memory_space=pltpu.VMEM)

    def term_mat(r, c):
        return pl.BlockSpec((r, c, block_l), lambda lb, k, *_: (0, 0, lb),
                            memory_space=pltpu.VMEM)

    def term_vec(r):
        return pl.BlockSpec((r, block_l), lambda lb, k, *_: (0, lb),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,     # w flags
        grid=(n_lb, N),
        in_specs=[
            # per-lane reg [1, L]
            pl.BlockSpec((1, block_l), lambda lb, k, *_: (0, lb),
                         memory_space=pltpu.VMEM),
            step_mat(xs, xs), step_mat(xs, us), step_vec(xs), step_vec(us),
            step_mat(xs, xs), step_mat(us, us), step_mat(us, xs),
            # defect at knot k+1 for step k:
            pl.BlockSpec((1, xs, block_l), lambda lb, k, *_: (N - k, 0, lb),
                         memory_space=pltpu.VMEM),
            term_vec(xs), term_mat(xs, xs),
        ],
        out_specs=[
            step_vec(xs), step_mat(xs, xs), step_mat(us, xs), step_vec(us),
            step_vec(us), step_mat(us, us), step_mat(us, xs),
            term_vec(1), term_vec(2),
        ],
        scratch_shapes=[
            pltpu.VMEM((xs, block_l), dt),        # G carry
            pltpu.VMEM((xs, xs, block_l), dt),    # H carry
            pltpu.VMEM((1, block_l), dt),         # ok accumulator
            pltpu.VMEM((1, block_l), dt),         # dv1
            pltpu.VMEM((1, block_l), dt),         # dv2
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((N, xs, L), dt),
        jax.ShapeDtypeStruct((N, xs, xs, L), dt),
        jax.ShapeDtypeStruct((N, us, xs, L), dt),
        jax.ShapeDtypeStruct((N, us, L), dt),
        jax.ShapeDtypeStruct((N, us, L), dt),
        jax.ShapeDtypeStruct((N, us, us, L), dt),
        jax.ShapeDtypeStruct((N, us, xs, L), dt),
        jax.ShapeDtypeStruct((1, L), dt),
        jax.ShapeDtypeStruct((2, L), dt),
    ]
    w_arr = jnp.asarray(w, jnp.int32)
    reg_arr = jnp.broadcast_to(jnp.asarray(reg, dt), (L,)).reshape(1, L)
    return pl.pallas_call(
        _sweep_kernel(xs, us, N),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(w_arr, reg_arr, A, B, lx, lu, lxx, luu, lux,
      defect, phix_term, phixx_term)
