"""Batched + sharded scenario solving on a virtual 8-device CPU mesh
(the driver validates multi-chip compilation the same way)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafempc_tpu.parallel.mesh import (make_batched_solver, replicate,
                                       scenario_mesh, shard_batch)
from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.solver.options import load_solver_options

from tests.test_hkd_solver import build, REF_SETTINGS


def _batch_inputs(pen, x0, Xb, Ub, B, rng):
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), pen)
    x0_b = jnp.asarray(x0)[None] + jnp.asarray(
        rng.normal(0, 0.01, (B, x0.shape[0])))
    Xb_b = jnp.broadcast_to(Xb, (B,) + Xb.shape)
    Ub_b = jnp.broadcast_to(Ub, (B,) + Ub.shape)
    return pen_b, x0_b, Xb_b, Ub_b


@pytest.fixture(scope="module")
def problem():
    return build(plan_dur=0.3)


def runtime_opts():
    opts = load_solver_options(f"{REF_SETTINGS}/ddp_setting.info")
    return dataclasses.replace(opts, max_AL_iter=2, max_DDP_iter=1)


def test_vmap_batched_solve(problem, rng):
    plan, pen, x0, Xb, Ub, _ = problem
    B = 4
    solve_b = make_batched_solver(hp.make_hkd_fns(), runtime_opts())
    pen_b, x0_b, Xb_b, Ub_b = _batch_inputs(pen, x0, Xb, Ub, B, rng)
    s = solve_b(plan, pen_b, x0_b, Xb_b, Ub_b)
    assert s.traj.Xbar.shape[0] == B
    assert bool(jnp.all(s.success))
    # different initial states -> different solutions
    assert float(jnp.abs(s.traj.Ubar[0] - s.traj.Ubar[1]).max()) > 0


def test_sharded_solve_matches_vmap(problem, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    plan, pen, x0, Xb, Ub, _ = problem
    B = 16
    mesh = scenario_mesh(8)
    pen_b, x0_b, Xb_b, Ub_b = _batch_inputs(pen, x0, Xb, Ub, B, rng)

    solve_v = make_batched_solver(hp.make_hkd_fns(), runtime_opts())
    s_ref = solve_v(plan, pen_b, x0_b, Xb_b, Ub_b)

    solve_s = make_batched_solver(hp.make_hkd_fns(), runtime_opts(),
                                  mesh=mesh)
    plan_r = replicate(plan, mesh)
    pen_s, x0_s, Xb_s, Ub_s = shard_batch((pen_b, x0_b, Xb_b, Ub_b), mesh)
    s_sh = solve_s(plan_r, pen_s, x0_s, Xb_s, Ub_s)

    np.testing.assert_allclose(np.asarray(s_sh.traj.Ubar),
                               np.asarray(s_ref.traj.Ubar),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_sh.cost),
                               np.asarray(s_ref.cost), rtol=1e-8)
