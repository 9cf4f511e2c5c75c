"""Parity of the fused LQ-approximation path vs the generic solver path.

Covers both sides of the problems/hkd_fused._lq_op custom_vmap bridge:
  * un-batched: the plain-JAX fallback, stage-level vs hsddp.lq_approx
    and inside a full solve;
  * batched: the lane-batched Pallas kernel (ops/fused_hkd_lq.py,
    interpret mode on CPU) stage-level and inside a full batched solve;
  * sharded: the full production configuration under shard_map.

The fused kernel emits the exact same quantities the generic
`vmap(jacfwd)`-free LQ stage produces (A/B incl. reset-map override,
ReB-folded running-cost partials, AL-folded terminal partials), so
agreement is to float tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafempc_tpu.problems import hkd_problem as hp
from cafempc_tpu.problems.hkd_fused import (make_hkd_fused_forward,
                                            make_hkd_fused_lq)
from cafempc_tpu.solver.hsddp import init_traj, make_solver
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


def _nominal_traj(problem, jitter=0.0, seed=0):
    """TrajState at a rolled-out nominal (X == Xbar after update), with
    optional state jitter so the LQ is evaluated off-reference."""
    plan, pen, x0, Xb, Ub, meta = problem
    opts = _opts()
    solve = make_solver(hp.make_hkd_fns(), opts)
    tr = init_traj(plan, Xb.shape[-1], Ub.shape[-1], 0, Xb, Ub, Xb.dtype)
    if jitter:
        rng = np.random.default_rng(seed)
        tr = tr._replace(
            Xbar=tr.Xbar + jnp.asarray(
                rng.normal(0, jitter, tr.Xbar.shape)),
            Ubar=tr.Ubar + jnp.asarray(
                rng.normal(0, jitter, tr.Ubar.shape)))
    tr, _ = solve._rollout(plan, tr, x0, 0.0)
    tr = tr._replace(Xbar=tr.X, Ubar=tr.U)
    return solve, plan, pen, tr


FIELDS = ("A", "B", "lx", "lu", "lxx", "luu", "phix", "phixx")


def test_fused_lq_fallback_matches_generic_stage(problem):
    """Stage-level: plain-JAX fallback == hsddp.lq_approx."""
    solve, plan, pen, tr = _nominal_traj(problem, jitter=0.02)
    tr_ref = jax.jit(solve._lq_approx)(plan, pen, tr)
    tr_fus = jax.jit(make_hkd_fused_lq())(plan, pen, tr)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(tr_fus, f)), np.asarray(getattr(tr_ref, f)),
            rtol=1e-9, atol=1e-11, err_msg=f)


def test_fused_lq_kernel_matches_generic_stage_batched(problem):
    """Stage-level: the Pallas kernel (interpret mode on CPU) under vmap
    == vmapped generic lq_approx, distinct scenarios per lane."""
    solve, plan, pen, tr = _nominal_traj(problem, jitter=0.02)
    B = 3
    rng = np.random.default_rng(1)
    tr_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape)
        + jnp.asarray(rng.normal(0, 0.01, (B,) + a.shape)), tr)
    pen_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         pen)
    ref = jax.jit(jax.vmap(solve._lq_approx,
                           in_axes=(None, 0, 0)))(plan, pen_b, tr_b)
    fus = jax.jit(jax.vmap(make_hkd_fused_lq(),
                           in_axes=(None, 0, 0)))(plan, pen_b, tr_b)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(fus, f)), np.asarray(getattr(ref, f)),
            rtol=1e-9, atol=1e-11, err_msg=f)


def test_fused_lq_unbatched_solve_matches_generic(problem):
    plan, pen, x0, Xb, Ub, meta = problem
    opts = _opts()
    kw = dict(parallel_line_search=False, max_resets=16)
    s_ref = jax.jit(make_solver(hp.make_hkd_fns(), opts, **kw))(
        plan, pen, x0, Xb, Ub)
    s_fus = jax.jit(make_solver(hp.make_hkd_fns(), opts,
                                fused_lq=make_hkd_fused_lq(),
                                **kw))(plan, pen, x0, Xb, Ub)
    np.testing.assert_allclose(np.asarray(s_fus.traj.Xbar),
                               np.asarray(s_ref.traj.Xbar),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(s_fus.cost), float(s_ref.cost),
                               rtol=1e-8)
    assert int(s_fus.info.ls_iters) == int(s_ref.info.ls_iters)


@pytest.mark.slow
def test_fused_lq_batched_solve_matches_generic(problem):
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
                                fused_lq=make_hkd_fused_lq(),
                                **kw)(plan, pen_b, x0_b, Xb_b, Ub_b)
    np.testing.assert_allclose(np.asarray(s_fus.Xbar),
                               np.asarray(s_ref.Xbar),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_fus.cost),
                               np.asarray(s_ref.cost), rtol=1e-7)
    np.testing.assert_array_equal(np.asarray(s_fus.info.ls_iters),
                                  np.asarray(s_ref.info.ls_iters))


@pytest.mark.slow
@pytest.mark.xslow
def test_fused_lq_under_shard_map(problem):
    """Production configuration: fused LQ + fused forward + fused Riccati
    + gather resets, sharded over the 8-device CPU mesh == plain vmap."""
    if len(jax.devices()) < 8:
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
              fused_forward=make_hkd_fused_forward(),
              fused_lq=make_hkd_fused_lq())
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
