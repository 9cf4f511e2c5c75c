"""Fused lane-batched Riccati-step kernel vs plain batched formulas
(interpret mode on CPU; on TPU it compiles and runs 2.1x faster than the
XLA-native step — docs/PERF.md)."""
import jax.numpy as jnp
import numpy as np

from cafempc_tpu.ops.riccati_step import riccati_step


def test_riccati_step_matches_reference(rng):
    xs, us, L = 12, 6, 128

    def spd(n, scale=1.0):
        M = rng.normal(size=(L, n, n))
        return scale * np.einsum("lij,lkj->lik", M, M) + 0.5 * np.eye(n)

    A_s = rng.normal(size=(L, xs, xs))
    B_s = rng.normal(size=(L, xs, us))
    lx_s = rng.normal(size=(L, xs))
    lu_s = rng.normal(size=(L, us))
    lxx_s = spd(xs, 0.1)
    luu_s = spd(us, 0.1)
    lux_s = rng.normal(size=(L, us, xs)) * 0.1
    G1_s = rng.normal(size=(L, xs))
    H1_s = spd(xs, 0.2)
    d_s = rng.normal(size=(L, xs)) * 0.01
    reg = 0.05

    def tolane(x):
        return jnp.asarray(np.moveaxis(x, 0, -1))

    out = riccati_step(tolane(A_s), tolane(B_s), tolane(lx_s),
                       tolane(lu_s), tolane(lxx_s), tolane(luu_s),
                       tolane(lux_s), tolane(G1_s), tolane(H1_s),
                       tolane(d_s), reg)
    G, H, K, dU, Qu, Quu, Qux, ok = [
        np.moveaxis(np.asarray(o), -1, 0) for o in out]

    Gc = G1_s + np.einsum("lij,lj->li", H1_s, d_s)
    Qx_r = lx_s + np.einsum("lji,lj->li", A_s, Gc)
    Qu_r = lu_s + np.einsum("lji,lj->li", B_s, Gc)
    Qxx_r = lxx_s + np.einsum("lji,ljk,lkm->lim", A_s, H1_s, A_s) \
        + reg * np.eye(xs)
    Quu_r = luu_s + np.einsum("lji,ljk,lkm->lim", B_s, H1_s, B_s) \
        + reg * np.eye(us)
    Qux_r = lux_s + np.einsum("lji,ljk,lkm->lim", B_s, H1_s, A_s)
    Qxx_r = 0.5 * (Qxx_r + np.swapaxes(Qxx_r, 1, 2))
    Qi = np.linalg.inv(Quu_r)
    dU_r = -np.einsum("lij,lj->li", Qi, Qu_r)
    K_r = -np.einsum("lij,ljk->lik", Qi, Qux_r)
    G_r = Qx_r + np.einsum("lji,lj->li", Qux_r, dU_r)
    H_r = Qxx_r + np.einsum("lji,ljk->lik", Qux_r, K_r)
    H_r = 0.5 * (H_r + np.swapaxes(H_r, 1, 2))

    for a, b in [(Qu, Qu_r), (Quu, Quu_r), (Qux, Qux_r), (dU, dU_r),
                 (K, K_r), (G, G_r), (H, H_r)]:
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1.0) < 1e-8
    assert np.asarray(ok).min() == 1.0
