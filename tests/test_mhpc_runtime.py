"""Cascaded MHPC receding-horizon runtime test (MHPCLocomotion analogue):
initialize + one MPC update, command-tape message integrity."""
import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-update receding-horizon WB solves

import dataclasses

import jax.numpy as jnp
import numpy as np

from cafempc_tpu.comms import lcm_wire as w
from cafempc_tpu.problems import mhpc_problem as mp
from cafempc_tpu.reference.quad_reference import (QuadReference,
                                                  load_quad_reference,
                                                  wb_state_ref_at)
from cafempc_tpu.runtime.mhpc_runtime import MHPCRuntime
from cafempc_tpu.solver.options import load_solver_options

REF = "/root/reference"


def test_mhpc_runtime_init_and_update():
    ref = load_quad_reference(
        f"{REF}/Reference/Data/bound/quad_reference.csv")
    qr = QuadReference(ref)
    qr.initialize(0.75)
    cfg = mp.load_mhpc_config(f"{REF}/MHPC/settings/mhpc_config.info")
    cfg = mp.load_cost_weights(
        f"{REF}/MHPC/settings/cost_weights_regular.JSON", cfg)
    cfg = mp.load_constraint_params(
        f"{REF}/MHPC/settings/constraint_params_regular.info", cfg)
    opts = load_solver_options(f"{REF}/MHPC/settings/ddp_setting.info")
    opts = dataclasses.replace(opts, max_AL_iter=3, max_DDP_iter=4,
                               max_AL_iter_runtime=2,
                               max_DDP_iter_runtime=1)
    rt = MHPCRuntime(qr, cfg, opts)

    x0 = wb_state_ref_at(qr, 0.0)
    msg = rt.initialize(x0)
    assert bool(rt.state.success)
    assert msg.N_mpcsteps == 8
    # message encodes/decodes through the LCM wire format
    out = w.MHPC_Command_lcmt.decode(msg.encode())
    assert out.N_mpcsteps == 8
    assert np.isfinite(np.asarray(out.torque)).all()
    assert np.isfinite(np.asarray(out.feedback)).all()
    assert out.Quu.shape == (8, 144)

    # one receding-horizon update from the predicted state
    x1 = np.asarray(rt.state.traj.Xbar[2])   # state after dt_mpc (2 wb steps)
    msg2 = rt.update(x1)
    assert bool(rt.state.success)
    assert float(rt.state.feas) < 5.0
    assert np.isfinite(np.asarray(msg2.torque)).all()
