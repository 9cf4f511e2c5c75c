"""Fused N-step backward-sweep Pallas kernel vs a plain recursion
(small dims; interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from cafempc_tpu.ops.fused_sweep import fused_backward_sweep


def test_fused_sweep_matches_recursion(rng):
    xs, us, N, L = 6, 3, 8, 128
    reg = 0.02

    def mk(shape, s=0.4):
        return rng.normal(size=shape) * s

    def mkspd(n, count):
        M = rng.normal(size=(count, n, n))
        return 0.2 * np.einsum("kij,kmj->kim", M, M) \
            + 0.5 * np.eye(n)

    A = mk((N, xs, xs))
    B = mk((N, xs, us))
    lx = mk((N, xs))
    lu = mk((N, us))
    lxx = mkspd(xs, N)
    luu = mkspd(us, N)
    lux = mk((N, us, xs), 0.05)
    phix = mk((N + 1, xs))
    phixx = mkspd(xs, N + 1)
    defect = mk((N + 1, xs), 0.01)
    w = np.zeros(N, np.int32)
    w[[2, 5]] = 1

    def lane(x):
        return jnp.asarray(np.repeat(np.asarray(x)[..., None], L, -1))

    # merged cost streams: transform steps carry phix/phixx rows
    lx_m = np.where(w[:, None] > 0, phix[:-1], lx)
    lxx_m = np.where(w[:, None, None] > 0, phixx[:-1], lxx)
    out = fused_backward_sweep(lane(A), lane(B), lane(lx_m), lane(lu),
                               lane(lxx_m), lane(luu), lane(lux),
                               lane(phix[-1]), lane(phixx[-1]),
                               lane(defect), w, reg)
    G_o, H_o, K_o = [np.asarray(o)[..., 0] for o in out[:3]]
    dv_o = np.asarray(out[8])[:, 0]

    # reference recursion
    G = phix[-1].copy()
    H = phixx[-1].copy()
    dv1 = dv2 = 0.0
    Ks = np.zeros((N, us, xs))
    Gs = np.zeros((N, xs))
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
            dU = -Qi @ Qu
            K = -Qi @ Qux
            Ks[k] = K
            dv_k = -Qu @ dU
            dv1 -= dv_k
            dv2 += dv_k
            G = Qx + Qux.T @ dU
            Hn = Qxx + Qux.T @ K
            H = 0.5 * (Hn + Hn.T)
        Gs[k] = G
    assert np.abs(K_o - Ks).max() < 1e-8
    assert np.abs(G_o - Gs).max() < 1e-7
    assert abs(dv_o[0] - dv1) < 1e-8
    assert abs(dv_o[1] - dv2) < 1e-8
    assert float(np.asarray(out[7]).min()) == 1.0
