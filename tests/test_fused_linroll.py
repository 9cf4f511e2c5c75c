"""Fused linear-rollout Pallas kernel vs plain recursion (interpret mode
on CPU), and the custom_vmap bridge dispatch."""
import jax
import jax.numpy as jnp
import numpy as np

from cafempc_tpu.ops.fused_linroll import fused_linear_rollout, linroll_op


def _reference(M, c, dx0):
    N, xs = M.shape[0], M.shape[1]
    dX = np.zeros((N, xs))
    dx = dx0.copy()
    for k in range(N):
        dx = M[k] @ dx + c[k]
        dX[k] = dx
    return dX


def test_fused_linroll_matches_recursion(rng):
    xs, N, L = 6, 9, 128
    M = rng.normal(size=(N, xs, xs)) * 0.4
    c = rng.normal(size=(N, xs)) * 0.1
    dx0 = rng.normal(size=(xs,))
    want = _reference(M, c, dx0)

    def lane(x):
        return jnp.asarray(np.repeat(np.asarray(x)[..., None], L, -1))

    out = np.asarray(fused_linear_rollout(lane(M), lane(c), lane(dx0)))
    np.testing.assert_allclose(out[..., 0], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[..., L - 1], want, rtol=1e-5, atol=1e-6)


def test_linroll_op_vmap_bridge(rng):
    """Batched op (kernel path) == per-sample scan path."""
    xs, N, B = 5, 7, 3
    M = jnp.asarray(rng.normal(size=(B, N, xs, xs)) * 0.4)
    c = jnp.asarray(rng.normal(size=(B, N, xs)) * 0.1)
    dx0 = jnp.asarray(rng.normal(size=(B, xs)))
    batched = jax.vmap(linroll_op)(M, c, dx0)
    single = jnp.stack([linroll_op(M[i], c[i], dx0[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
