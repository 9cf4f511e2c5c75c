"""Solve-level parity of the fused Pallas paths (interpret mode on CPU):

  * make_solver(fused_riccati=True) == default sweep, end to end;
  * the fused path under shard_map over the 8-device CPU mesh == vmap —
    the production configuration of the scenario engine.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafempc_tpu.parallel.mesh import (make_batched_solver, replicate,
                                       scenario_mesh, shard_batch)
from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.solver.hsddp import make_solver
from cafempc_tpu.solver.options import load_solver_options

from tests.test_hkd_solver import build, REF_SETTINGS


@pytest.fixture(scope="module")
def problem():
    return build(plan_dur=0.3)


def runtime_opts():
    opts = load_solver_options(f"{REF_SETTINGS}/ddp_setting.info")
    return dataclasses.replace(opts, max_AL_iter=2, max_DDP_iter=1)


def _batch_inputs(pen, x0, Xb, Ub, B, rng):
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), pen)
    x0_b = jnp.asarray(x0)[None] + jnp.asarray(
        rng.normal(0, 0.01, (B, x0.shape[0])))
    Xb_b = jnp.broadcast_to(Xb, (B,) + Xb.shape)
    Ub_b = jnp.broadcast_to(Ub, (B,) + Ub.shape)
    return pen_b, x0_b, Xb_b, Ub_b


@pytest.mark.slow
def test_fused_solver_matches_default(problem):
    """ADVICE r1: the headline bench runs fused_riccati=True — assert the
    FULL solver (not just the kernel) reproduces the default path."""
    plan, pen, x0, Xb, Ub, _ = problem
    opts = runtime_opts()
    fns = hp.make_hkd_fns()
    s_ref = jax.jit(make_solver(fns, opts))(plan, pen, x0, Xb, Ub)
    s_fus = jax.jit(make_solver(fns, opts, fused_riccati=True))(
        plan, pen, x0, Xb, Ub)
    np.testing.assert_allclose(np.asarray(s_fus.traj.Xbar),
                               np.asarray(s_ref.traj.Xbar),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_fus.traj.Ubar),
                               np.asarray(s_ref.traj.Ubar),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(float(s_fus.cost), float(s_ref.cost),
                               rtol=1e-9)
    assert int(s_fus.info.iters) == int(s_ref.info.iters)
    assert bool(s_fus.success)


@pytest.mark.slow
@pytest.mark.xslow
def test_fused_sharded_matches_vmap(problem, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    plan, pen, x0, Xb, Ub, _ = problem
    B = 8
    mesh = scenario_mesh(8)
    pen_b, x0_b, Xb_b, Ub_b = _batch_inputs(pen, x0, Xb, Ub, B, rng)

    solve_v = make_batched_solver(hp.make_hkd_fns(), runtime_opts(),
                                  fused_riccati=True)
    s_ref = solve_v(plan, pen_b, x0_b, Xb_b, Ub_b)

    solve_s = make_batched_solver(hp.make_hkd_fns(), runtime_opts(),
                                  mesh=mesh, fused_riccati=True)
    plan_r = replicate(plan, mesh)
    pen_s, x0_s, Xb_s, Ub_s = shard_batch((pen_b, x0_b, Xb_b, Ub_b), mesh)
    s_sh = solve_s(plan_r, pen_s, x0_s, Xb_s, Ub_s)

    np.testing.assert_allclose(np.asarray(s_sh.traj.Ubar),
                               np.asarray(s_ref.traj.Ubar),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_sh.cost),
                               np.asarray(s_ref.cost), rtol=1e-8)


def test_vmap_batched_solve_default_path(problem, rng):
    """Non-fused default path under plain vmap (folded from the former
    test_parallel.py; the sharded variants above cover shard_map)."""
    plan, pen, x0, Xb, Ub, _ = problem
    B = 4
    solve_b = make_batched_solver(hp.make_hkd_fns(), runtime_opts())
    pen_b, x0_b, Xb_b, Ub_b = _batch_inputs(pen, x0, Xb, Ub, B, rng)
    s = solve_b(plan, pen_b, x0_b, Xb_b, Ub_b)
    assert s.traj.Xbar.shape[0] == B
    assert bool(jnp.all(s.success))
    # different initial states -> different solutions
    assert float(jnp.abs(s.traj.Ubar[0] - s.traj.Ubar[1]).max()) > 0
