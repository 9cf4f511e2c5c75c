"""Knot-axis-sharded Riccati sweep (parallel/knot_riccati.py) vs the
sequential backward recursion, on the virtual 8-device CPU mesh —
SURVEY 2.7's horizon-partitioned (sequence-parallel) axis, with reset
transforms composed across shard boundaries."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafempc_tpu.parallel.knot_riccati import (knot_mesh,
                                               sharded_riccati_GH)


def _sequential_GH(A, B, lx, lu, lxx, luu, lux, phix, phixx, defect, w,
                   reg):
    N, xs = A.shape[0], A.shape[1]
    us = B.shape[2]
    G = phix[-1].copy()
    H = phixx[-1].copy()
    Gs = np.zeros((N + 1, xs))
    Hs = np.zeros((N + 1, xs, xs))
    Gs[-1], Hs[-1] = G, H
    for k in reversed(range(N)):
        Gn = G + H @ defect[k + 1]
        if w[k]:
            G = phix[k] + A[k].T @ Gn
            H = phixx[k] + A[k].T @ H @ A[k]
        else:
            Qx = lx[k] + A[k].T @ Gn
            Qu = lu[k] + B[k].T @ Gn
            Qxx = lxx[k] + A[k].T @ H @ A[k] + reg * np.eye(xs)
            Quu = luu[k] + B[k].T @ H @ B[k] + reg * np.eye(us)
            Qux = lux[k] + B[k].T @ H @ A[k]
            Qi = np.linalg.inv(Quu)
            G = Qx - Qux.T @ (Qi @ Qu)
            Hn = Qxx - Qux.T @ (Qi @ Qux)
            H = 0.5 * (Hn + Hn.T)
        Gs[k], Hs[k] = G, H
    Gs[0] = Gs[0] + Hs[0] @ defect[0]
    return Gs, Hs


@pytest.mark.parametrize("N", [23, 32])
def test_sharded_matches_sequential(N, rng):
    """N=23 exercises identity padding (8 devices, 24 knots incl.
    terminal); resets land both inside blocks and at block boundaries."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    xs, us, ys = 6, 3, 2
    reg = 0.05

    def mk(shape, s=0.4):
        return rng.normal(size=shape) * s

    def mkspd(n, count, s=0.3):
        M = rng.normal(size=(count, n, n)) * s
        return np.einsum("kij,kmj->kim", M, M) + 0.5 * np.eye(n)

    A = mk((N, xs, xs))
    B = mk((N, xs, us))
    C = mk((N, ys, xs), 0.2)
    D = mk((N, ys, us), 0.2)
    lx = mk((N, xs))
    lu = mk((N, us))
    ly = mk((N, ys))
    lxx = mkspd(xs, N)
    luu = mkspd(us, N)
    lux = mk((N, us, xs), 0.05)
    lyy = mkspd(ys, N, 0.1)
    phix = mk((N + 1, xs))
    phixx = mkspd(xs, N + 1)
    defect = mk((N + 1, xs), 0.01)
    # resets: one mid-block, one exactly at a shard boundary (knot 8*q)
    w = np.zeros(N, bool)
    w[[5, 8, 16]] = True

    # fold the y-output streams into the plain recursion's cost arrays
    lx_eff = lx + np.einsum("kij,ki->kj", C, ly)
    lu_eff = lu + np.einsum("kij,ki->kj", D, ly)
    lxx_eff = lxx + np.einsum("kji,kjl,klm->kim", C, lyy, C)
    luu_eff = luu + np.einsum("kji,kjl,klm->kim", D, lyy, D)
    lux_eff = lux + np.einsum("kji,kjl,klm->kim", D, lyy, C)
    G_ref, H_ref = _sequential_GH(A, B, lx_eff, lu_eff, lxx_eff,
                                  luu_eff, lux_eff, phix, phixx, defect,
                                  w, reg)

    mesh = knot_mesh(8)
    G, H = jax.jit(lambda *a: sharded_riccati_GH(*a, reg=reg, mesh=mesh))(
        *map(jnp.asarray, (A, B, C, D, lx, lu, ly, lxx, luu, lux, lyy,
                           phix, phixx, defect, w)))
    np.testing.assert_allclose(np.asarray(G), G_ref, rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=0, atol=1e-8)
