"""Fused lane-batched linear rollout (Pallas).

The multiple-shooting search direction is the affine recursion

    dx_{k+1} = M_k dx_k + c_k,   M_k = A_k + B_k K_k  (dynamics steps)
                                 M_k = Px_k            (reset/padding steps)

(SinglePhase.cpp:145-178 + MultiPhaseDDP.cpp:12-42).  The associative-scan
formulation is exact but materializes O(N) composed [xs,xs] matrices per
level in HBM; this kernel instead carries dx in VMEM across a sequential
knot grid dimension — per step only an [xs,xs] x [xs] matvec per lane —
so the pass runs at operand-streaming speed.

Layout matches ops/fused_sweep.py: knot-major, lane-minor — M [N,xs,xs,L],
c [N,xs,L], dx0 [xs,L]; L a multiple of the 128-lane block.

`linroll_op` is the custom_vmap bridge: un-batched calls run a lax.scan
with identical semantics; under the scenario vmap the kernel is invoked.
"""
import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cafempc_tpu.ops.common import _interpret


def _linroll_kernel(xs, n_steps):
    def kernel(M_ref, c_ref, dx0_ref, out_ref, dx_s):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            dx_s[:] = dx0_ref[:]

        M = M_ref[0]                       # [xs, xs, L]
        c = c_ref[0]                       # [xs, L]
        dx = dx_s[:]
        dxn = c + sum(M[:, j, :] * dx[j][None, :] for j in range(xs))
        dx_s[:] = dxn
        out_ref[0] = dxn
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l",))
def fused_linear_rollout(M, c, dx0, block_l=128):
    """dX[k+1] = M[k] dX[k] + c[k], dX[0] = dx0; returns dX[1:] [N,xs,L]."""
    N, xs = M.shape[0], M.shape[1]
    L = M.shape[3]
    assert L % block_l == 0
    n_lb = L // block_l
    dt = M.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_lb, N),
        in_specs=[
            pl.BlockSpec((1, xs, xs, block_l), lambda lb, k: (k, 0, 0, lb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xs, block_l), lambda lb, k: (k, 0, lb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xs, block_l), lambda lb, k: (0, lb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, xs, block_l), lambda lb, k: (k, 0, lb),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((xs, block_l), dt)],
    )
    (out,) = pl.pallas_call(
        _linroll_kernel(xs, N),
        out_shape=[jax.ShapeDtypeStruct((N, xs, L), dt)],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(M, c, dx0)
    return out


@custom_batching.custom_vmap
def linroll_op(M, c, dx0):
    """Affine rollout for ONE scenario: M [N,xs,xs], c [N,xs], dx0 [xs]
    -> dX[1:] [N,xs]."""
    def step(dx, inp):
        Mk, ck = inp
        dxn = Mk @ dx + ck
        return dxn, dxn
    _, dX = jax.lax.scan(step, dx0, (M, c))
    return dX


@linroll_op.def_vmap
def _linroll_op_vmap(axis_size, in_batched, M, c, dx0):
    Mb, cb, dx0b = in_batched
    Bsz = axis_size
    pad = (-Bsz) % 128
    L = Bsz + pad

    def lane(x, batched):
        if not batched:
            x = jnp.broadcast_to(x[None], (Bsz,) + x.shape)
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.repeat(x[..., :1], pad, axis=-1)], axis=-1)
        return x

    out = fused_linear_rollout(lane(M, Mb), lane(c, cb), lane(dx0, dx0b))
    return jnp.moveaxis(out[..., :Bsz], -1, 0), True
