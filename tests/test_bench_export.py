"""jax.export round trip of the batched solver (the bench.py fast path
that skips the ~13 min cascade500 Python trace on the 2-core host):
serialize -> deserialize -> identical results, with every NamedTuple
pytree in the solve signature registered for serialization."""
import jax
import jax.numpy as jnp
import numpy as np

from cafempc_tpu.models import hkd
from cafempc_tpu.parallel.mesh import make_batched_solver
from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.reference.quad_reference import (QuadReference,
                                                  load_quad_reference)
from cafempc_tpu.solver.options import SolverOptions
from cafempc_tpu.solver.plan import host_plan_to_device


def test_export_roundtrip_batched_solver():
    import bench
    bench._register_export_types()
    from jax import export as jexport

    dtype = jnp.float64   # tests run under the x64 conftest
    ref = load_quad_reference(
        "/root/reference/Reference/Data/bound/quad_reference.csv",
        reorder=True)
    qr = QuadReference(ref)
    qr.initialize(0.3)
    cfg = hp.HKDConfig(plan_duration=0.3, n_steps_max=40)
    plan_np, pen_np, Xbar0, Ubar0, meta = hp.build_hkd_plan(qr, cfg)
    plan = host_plan_to_device(plan_np, dtype=dtype)
    pen = hp.pen_to_device(pen_np, dtype=dtype)
    body = np.zeros(12)
    body[5] = 0.2486
    qJ = np.array([0, -0.8, 1.6] * 4, dtype=float)
    qd = hkd.compute_hkd_state(
        jnp.asarray(body[0:3], dtype), jnp.asarray(body[3:6], dtype),
        jnp.asarray(qJ, dtype), jnp.asarray(meta["phases"][0][3], dtype))
    x0 = np.concatenate([body, np.asarray(qd)])

    B = 2
    x0_b = jnp.asarray(np.tile(x0, (B, 1)), dtype)
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         pen)
    Xb_b = jnp.broadcast_to(jnp.asarray(Xbar0, dtype), (B,) + Xbar0.shape)
    Ub_b = jnp.broadcast_to(jnp.asarray(Ubar0, dtype), (B,) + Ubar0.shape)

    opts = SolverOptions(max_AL_iter=2, max_DDP_iter=1)
    solve_b = make_batched_solver(hp.make_hkd_fns(), opts,
                                  trim_output=True,
                                  parallel_line_search=False,
                                  max_resets=16, reg_floor=1e-3)
    args = (plan, pen_b, x0_b, Xb_b, Ub_b)
    s_direct = solve_b(*args)

    exp = jexport.export(solve_b)(*args)
    data = exp.serialize()
    assert len(data) > 1000
    exp2 = jexport.deserialize(data)
    s_rt = jax.jit(exp2.call)(*args)

    assert type(s_rt).__name__ == "SolveResult"
    np.testing.assert_array_equal(np.asarray(s_rt.cost),
                                  np.asarray(s_direct.cost))
    np.testing.assert_array_equal(np.asarray(s_rt.Xbar),
                                  np.asarray(s_direct.Xbar))
    assert bool(np.asarray(s_rt.success).all())
