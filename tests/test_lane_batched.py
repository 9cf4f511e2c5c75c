"""Lane-batched Pallas primitive tests (interpret mode on CPU; compiled
on TPU, where they beat XLA-native by ~1.9x for the chol+solve+gram
chain — see docs/PERF.md)."""
import jax.numpy as jnp
import numpy as np

from cafempc_tpu.ops import lane_batched as lb


def _spd(rng, L, n):
    M = rng.normal(size=(L, n, n)).astype(np.float64)
    return np.einsum("lij,lkj->lik", M, M) + 0.1 * np.eye(n)


def test_lb_gram(rng):
    n, L = 12, 128
    A_std = rng.normal(size=(L, n, n))
    S_std = _spd(rng, L, n)
    A = jnp.asarray(np.transpose(A_std, (1, 2, 0)))
    H = jnp.asarray(np.transpose(S_std, (1, 2, 0)))
    out = np.transpose(np.asarray(lb.lb_gram(A, H)), (2, 0, 1))
    ref = np.einsum("lji,ljk,lkm->lim", A_std, S_std, A_std)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-10


def test_lb_cholesky_and_solve(rng):
    n, L, m = 12, 128, 4
    S_std = _spd(rng, L, n)
    B_std = rng.normal(size=(L, n, m))
    H = jnp.asarray(np.transpose(S_std, (1, 2, 0)))
    B = jnp.asarray(np.transpose(B_std, (1, 2, 0)))
    Lc = lb.lb_cholesky(H)
    Lc_ref = np.linalg.cholesky(S_std)
    assert np.abs(np.transpose(np.asarray(Lc), (2, 0, 1))
                  - Lc_ref).max() < 1e-9
    X = np.transpose(np.asarray(lb.lb_cho_solve(Lc, B)), (2, 0, 1))
    X_ref = np.linalg.solve(S_std, B_std)
    assert np.abs(X - X_ref).max() / np.abs(X_ref).max() < 1e-9
