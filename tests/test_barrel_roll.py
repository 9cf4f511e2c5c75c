"""Barrel-roll TO test (testBarrelRollTO.cpp analogue): 6-phase acrobatic
whole-body trajectory optimization with hand-authored keyframes.

Checks physical plausibility the way the reference harness does (it
publishes centroidal momentum for inspection): the optimized motion must
complete a full 2*pi body roll, respect the torque barrier, and keep the
dynamics defects small."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cafempc_tpu.problems import barrel_roll as br
from cafempc_tpu.solver.hsddp import make_solver
from cafempc_tpu.solver.options import load_solver_options
from cafempc_tpu.solver.plan import host_plan_to_device

SETTINGS = "/root/reference/MHPC/MHPC-Trajopt/BarrelRoll/setting"


@pytest.fixture(scope="module")
def solved():
    plan_np, pen_np, Xbar0, Ubar0, meta = br.build_barrel_roll_plan(
        SETTINGS)
    plan = host_plan_to_device(plan_np, dtype=jnp.float64)
    pen = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                       pen_np)
    opts = load_solver_options(f"{SETTINGS}/br_ddp_setting.info")
    # keep the test fast: fewer AL iterations than the reference's 30
    opts = dataclasses.replace(opts, max_AL_iter=6, max_DDP_iter=8)
    solve = jax.jit(make_solver(br.make_barrel_roll_fns(), opts))
    x0 = jnp.asarray(br.initial_state())
    s = solve(plan, pen, x0, jnp.asarray(Xbar0), jnp.asarray(Ubar0))
    return s, plan_np, meta


def test_barrel_roll_converges(solved):
    s, plan_np, meta = solved
    assert bool(s.success)
    n = int(s.info.n_entries)
    feas = np.asarray(s.info.dyn_feas_buf[:n])
    assert float(s.feas) < 5e-2
    assert feas[-1] < 1e-2 * feas[0]


def test_full_roll_completed(solved):
    s, plan_np, meta = solved
    Xbar = np.asarray(s.traj.Xbar)
    active = np.asarray(plan_np.knot.active) > 0
    roll = Xbar[active][:, 5]
    # roll angle progresses from ~0 to ~2*pi
    assert roll[0] < 0.1
    assert abs(roll[-1] - 2 * np.pi) < 0.5
    assert roll.max() > 0.9 * 2 * np.pi


def test_torque_limits_respected(solved):
    s, plan_np, meta = solved
    U = np.asarray(s.traj.Ubar)
    active = (np.asarray(plan_np.step.active) > 0) \
        & (np.asarray(plan_np.step.is_reset) == 0)
    assert np.abs(U[active]).max() < br.TORQUE_LIMIT + 0.5
