"""Parity of the fused forward (trial) path vs the generic solver path.

Covers both sides of the ops/fused_hkd_trial custom_vmap bridge:
  * un-batched: the plain-JAX fallback inside a full solve;
  * batched: the lane-batched Pallas kernel (interpret mode on CPU)
    inside a full batched solve.

The fused path folds the search direction as dU + K dX (eps-independent)
where the generic path applies K to (X - Xbar) per trial, so agreement is
to float tolerance, not bit-exact.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.problems.hkd_fused import make_hkd_fused_forward
from cafempc_tpu.solver.hsddp import make_solver
from cafempc_tpu.solver.options import load_solver_options
from cafempc_tpu.parallel.mesh import (make_batched_solver, replicate,
                                       scenario_mesh, shard_batch)

from tests.test_hkd_solver import build, REF_SETTINGS


def _opts(max_al=2, max_ddp=1):
    opts = load_solver_options(f"{REF_SETTINGS}/ddp_setting.info")
    return dataclasses.replace(opts, max_AL_iter=max_al,
                               max_DDP_iter=max_ddp)


@pytest.fixture(scope="module")
def problem():
    return build(plan_dur=0.3)


def test_fused_forward_unbatched_matches_generic(problem):
    plan, pen, x0, Xb, Ub, meta = problem
    opts = _opts()
    kw = dict(parallel_line_search=False, max_resets=16)
    s_ref = jax.jit(make_solver(hp.make_hkd_fns(), opts, **kw))(
        plan, pen, x0, Xb, Ub)
    s_fus = jax.jit(make_solver(hp.make_hkd_fns(), opts,
                                fused_forward=make_hkd_fused_forward(),
                                **kw))(plan, pen, x0, Xb, Ub)
    np.testing.assert_allclose(np.asarray(s_fus.traj.Xbar),
                               np.asarray(s_ref.traj.Xbar),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(s_fus.cost), float(s_ref.cost),
                               rtol=1e-8)
    assert int(s_fus.info.ls_iters) == int(s_ref.info.ls_iters)


@pytest.mark.slow
def test_fused_forward_batched_kernel_matches_generic(problem):
    plan, pen, x0, Xb, Ub, meta = problem
    opts = _opts()
    B = 2
    rng = np.random.default_rng(0)
    x0_b = jnp.asarray(np.asarray(x0)[None]
                       + rng.normal(0, 0.005, (B, x0.shape[-1])))
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         pen)
    Xb_b = jnp.broadcast_to(Xb, (B,) + Xb.shape)
    Ub_b = jnp.broadcast_to(Ub, (B,) + Ub.shape)
    kw = dict(trim_output=True, parallel_line_search=False, max_resets=16)
    s_ref = make_batched_solver(hp.make_hkd_fns(), opts, **kw)(
        plan, pen_b, x0_b, Xb_b, Ub_b)
    s_fus = make_batched_solver(hp.make_hkd_fns(), opts,
                                fused_forward=make_hkd_fused_forward(),
                                **kw)(plan, pen_b, x0_b, Xb_b, Ub_b)
    np.testing.assert_allclose(np.asarray(s_fus.Xbar),
                               np.asarray(s_ref.Xbar),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_fus.cost),
                               np.asarray(s_ref.cost), rtol=1e-7)
    np.testing.assert_array_equal(np.asarray(s_fus.info.ls_iters),
                                  np.asarray(s_ref.info.ls_iters))


@pytest.mark.slow
@pytest.mark.xslow
def test_fused_forward_under_shard_map(problem):
    """Production configuration: fused forward + fused Riccati + gather
    resets, sharded over the 8-device CPU mesh == plain vmap."""
    import jax as _jax
    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    plan, pen, x0, Xb, Ub, meta = problem
    opts = _opts()
    B = 8
    rng = np.random.default_rng(1)
    x0_b = jnp.asarray(np.asarray(x0)[None]
                       + rng.normal(0, 0.005, (B, x0.shape[-1])))
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         pen)
    Xb_b = jnp.broadcast_to(Xb, (B,) + Xb.shape)
    Ub_b = jnp.broadcast_to(Ub, (B,) + Ub.shape)
    kw = dict(trim_output=True, parallel_line_search=False, max_resets=16,
              fused_riccati=True, reg_floor=1e-3,
              fused_forward=make_hkd_fused_forward())
    s_ref = make_batched_solver(hp.make_hkd_fns(), opts, **kw)(
        plan, pen_b, x0_b, Xb_b, Ub_b)
    mesh = scenario_mesh(8)
    solve_s = make_batched_solver(hp.make_hkd_fns(), opts, mesh=mesh, **kw)
    plan_r = replicate(plan, mesh)
    pen_s, x0_s, Xb_s, Ub_s = shard_batch((pen_b, x0_b, Xb_b, Ub_b), mesh)
    s_sh = solve_s(plan_r, pen_s, x0_s, Xb_s, Ub_s)
    np.testing.assert_allclose(np.asarray(s_sh.Ubar),
                               np.asarray(s_ref.Ubar),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_sh.cost),
                               np.asarray(s_ref.cost), rtol=1e-8)
