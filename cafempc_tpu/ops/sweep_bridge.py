"""Bridge between the per-scenario solver and the lane-batched fused
backward-sweep kernel.

`sweep_op` is a jax.custom_batching.custom_vmap operation:
  * called un-batched (single-scenario MPC, CPU tests), it runs a compact
    sequential recursion with identical semantics;
  * under `vmap` (the batched scenario engine), it transposes the
    batch-leading operands to the kernel's lane-minor layout, pads the
    batch to a lane multiple, and invokes ops/fused_sweep.py.
"""
import jax
import jax.numpy as jnp
from jax import custom_batching

from cafempc_tpu.ops.fused_sweep import fused_backward_sweep


@custom_batching.custom_vmap
def sweep_op(A, B, lx, lu, lxx, luu, lux, phix_term, phixx_term, defect,
             w, reg):
    """Backward sweep for ONE scenario.  Shapes: A [N,xs,xs], B [N,xs,us],
    lx [N,xs] (MERGED: phix rows on transform steps), lxx [N,xs,xs]
    (merged likewise), phix_term [xs]/phixx_term [xs,xs] terminal cost,
    defect [N+1,xs], w [N] int32, reg scalar.
    Returns (G [N,xs], H, K, dU, Qu, Quu, Qux, ok [], dv [2])."""
    xs = A.shape[1]
    us = B.shape[2]
    I_u = jnp.eye(us, dtype=A.dtype)

    def step(carry, inp):
        G1, H1, ok, dv1, dv2 = carry
        (Ak, Bk, lxk, luk, lxxk, luuk, luxk, dft, wk) = inp
        Gn = G1 + H1 @ dft
        # merged cost streams: Qx/Qxx_base double as the transform branch
        Qx = lxk + Ak.T @ Gn
        Qxx_base = lxxk + Ak.T @ H1 @ Ak
        G_tr = Qx
        H_tr = Qxx_base
        Qu = luk + Bk.T @ Gn
        Qxx = Qxx_base + reg * jnp.eye(xs, dtype=A.dtype)
        Qxx = 0.5 * (Qxx + Qxx.T)
        Quu = luuk + Bk.T @ H1 @ Bk + reg * I_u
        Qux = luxk + Bk.T @ H1 @ Ak
        L = jnp.linalg.cholesky(Quu - 1e-9 * I_u)
        ok_k = jnp.all(jnp.isfinite(L))
        L_safe = jnp.where(ok_k, L, I_u)
        Quu_inv = jax.scipy.linalg.cho_solve((L_safe, True), I_u)
        dU = -Quu_inv @ Qu
        K = -Quu_inv @ Qux
        G_dyn = Qx + Qux.T @ dU
        H_dyn = Qxx + Qux.T @ K
        H_dyn = 0.5 * (H_dyn + H_dyn.T)
        wf = (wk > 0)
        G0 = jnp.where(wf, G_tr, G_dyn)
        H0 = jnp.where(wf, H_tr, H_dyn)
        z = jnp.where(wf, 0.0, 1.0).astype(A.dtype)
        dv_k = (Qu @ dU) * z
        out = (G0, H0, jnp.where(wf, jnp.zeros_like(K), K),
               jnp.where(wf, jnp.zeros_like(dU), dU),
               jnp.where(wf, jnp.zeros_like(Qu), Qu),
               jnp.where(wf, I_u, Quu),
               jnp.where(wf, jnp.zeros_like(Qux), Qux))
        return (G0, H0, ok & (ok_k | wf), dv1 + dv_k, dv2 - dv_k), out

    zero = jnp.zeros((), A.dtype)
    inp = (A, B, lx, lu, lxx, luu, lux, defect[1:], w)
    (G0, H0, ok, dv1, dv2), (G, H, K, dU, Qu, Quu, Qux) = jax.lax.scan(
        step, (phix_term, phixx_term, jnp.bool_(True), zero, zero), inp,
        reverse=True)
    dv = jnp.stack([dv1, dv2])
    return G, H, K, dU, Qu, Quu, Qux, ok.astype(A.dtype), dv


@sweep_op.def_vmap
def _sweep_op_vmap(axis_size, in_batched, A, B, lx, lu, lxx, luu, lux,
                   phix, phixx, defect, w, reg):
    # phix/phixx here are the TERMINAL-knot cost (the step streams are
    # merged into lx/lxx by the caller)
    (Ab, Bb, lxb, lub, lxxb, luub, luxb, phixb, phixxb, defectb, wb,
     regb) = in_batched
    assert not wb, "plan flags must be unbatched"

    Bsz = axis_size
    xs = A.shape[1 + int(Ab)]
    block_l = 128
    pad = (-Bsz) % block_l
    L = Bsz + pad

    def lane(x, batched):
        if not batched:
            x = jnp.broadcast_to(x[None], (Bsz,) + x.shape)
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.repeat(x[..., :1], pad, axis=-1)], axis=-1)
        return x

    reg_l = lane(reg, regb) if regb else reg
    ops = (lane(A, Ab), lane(B, Bb), lane(lx, lxb), lane(lu, lub),
           lane(lxx, lxxb), lane(luu, luub), lane(lux, luxb),
           lane(phix, phixb), lane(phixx, phixxb), lane(defect, defectb))
    if xs <= 24 or L == block_l:
        out = fused_backward_sweep(*ops, w, reg_l, block_l=block_l)
    else:
        # Wide states (xs=36 MHPC cascade) + multiple lane blocks crash
        # the Mosaic compiler (round-3 probe: (36,12,L=256) fails,
        # (36,12,L=128) and (24,12,L=256) compile) — run one kernel call
        # per 128-lane chunk and stitch the lane axis back together.
        chunks = []
        for c in range(0, L, block_l):
            sl = lambda x: x[..., c:c + block_l]
            reg_c = sl(reg_l) if regb else reg_l
            chunks.append(fused_backward_sweep(
                *(sl(o) for o in ops), w, reg_c, block_l=block_l))
        out = tuple(jnp.concatenate(parts, axis=-1)
                    for parts in zip(*chunks))
    G, H, K, dU, Qu, Quu, Qux, ok, dv = out

    def unlane(x):
        return jnp.moveaxis(x[..., :Bsz], -1, 0)

    res = (unlane(G), unlane(H), unlane(K), unlane(dU), unlane(Qu),
           unlane(Quu), unlane(Qux), ok[0, :Bsz], unlane(dv))
    return res, tuple([True] * 9)
