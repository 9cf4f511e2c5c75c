"""Receding-horizon MPC runtime for the cascaded MHPC problem.

Functional equivalent of the reference MHPCLocomotion (MHPC/
MHPCLocomotion.cpp): initialize() does the full-cap solve; update() steps
the reference window by dt_mpc, rebuilds the flat cascaded plan (the
reference's update_WB_plan/update_SRB_plan deque surgery,
MHPCProblem.cpp:252-397), warm-starts from the previous solution, and
re-solves with the runtime caps.  publish_mpc_cmd's 8-step command tape —
x, tau, GRF, Qu, Quu, Qux, feedback K per step (MHPCLocomotion.cpp:190-287)
— is produced as an MHPC_Command_lcmt message.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cafempc_tpu.comms import lcm_wire as w
from cafempc_tpu.problems import mhpc_problem as mp
from cafempc_tpu.reference.quad_reference import (QuadReference,
                                                  wb_state_ref_at)
from cafempc_tpu.solver.hsddp import make_solver
from cafempc_tpu.solver.options import SolverOptions
from cafempc_tpu.solver.plan import host_plan_to_device


class MHPCRuntime:
    def __init__(self, quad_ref: QuadReference, cfg: mp.MHPCConfig,
                 opts: SolverOptions, dtype=jnp.float64,
                 n_cmd_steps=8):
        self.qr = quad_ref
        self.cfg = cfg
        self.dtype = dtype
        self.n_cmd_steps = n_cmd_steps
        fns = mp.make_mhpc_fns(cfg)
        self.solve_init = jax.jit(make_solver(fns, opts))
        self.solve_rt = jax.jit(make_solver(fns, opts.runtime()))
        self.mpc_time = 0.0
        self.state = None
        self.plan_np = None
        self.meta = None

    def _build(self):
        return mp.build_mhpc_plan(self.qr, self.cfg)

    def _warm_start(self, plan_np, Xbar0, Ubar0):
        """Time-aligned carry-over of the previous solution (the reference
        keeps shifted deques; here old knot times map onto new knots)."""
        if self.state is None:
            return Xbar0, Ubar0
        dt_mpc = self.cfg.dt_mpc
        old_t = np.asarray(self.plan_np.knot.t) + (self.mpc_time - dt_mpc)
        old_active = np.asarray(self.plan_np.knot.active) > 0
        old_model = np.asarray(self.plan_np.knot.model_id)
        new_t = np.asarray(plan_np.knot.t) + self.mpc_time
        new_active = np.asarray(plan_np.knot.active) > 0
        new_model = np.asarray(plan_np.knot.model_id)
        oXb = np.asarray(self.state.traj.Xbar)
        oUb = np.asarray(self.state.traj.Ubar)
        Xb, Ub = Xbar0.copy(), Ubar0.copy()
        for j in np.where(new_active)[0]:
            cand = np.where(old_active
                            & (np.abs(old_t - new_t[j]) < 1e-6)
                            & (old_model == new_model[j]))[0]
            if len(cand):
                Xb[j] = oXb[cand[-1]]
                if j < len(Ub) and cand[-1] < len(oUb):
                    Ub[j] = oUb[cand[-1]]
        return Xb, Ub

    def initialize(self, x0):
        plan_np, pen_np, Xbar0, Ubar0, meta = self._build()
        plan = host_plan_to_device(plan_np, self.dtype)
        pen = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), self.dtype), pen_np)
        s = self.solve_init(plan, pen, jnp.asarray(x0, self.dtype),
                            jnp.asarray(Xbar0, self.dtype),
                            jnp.asarray(Ubar0, self.dtype))
        self.state = jax.block_until_ready(s)
        self.plan_np, self.meta = plan_np, meta
        return self.command_message()

    def update(self, x_meas):
        self.qr.step(self.cfg.dt_mpc)
        self.mpc_time += self.cfg.dt_mpc
        plan_np, pen_np, Xbar0, Ubar0, meta = self._build()
        Xb, Ub = self._warm_start(plan_np, Xbar0, Ubar0)
        plan = host_plan_to_device(plan_np, self.dtype)
        pen = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), self.dtype), pen_np)
        s = self.solve_rt(plan, pen, jnp.asarray(x_meas, self.dtype),
                          jnp.asarray(Xb, self.dtype),
                          jnp.asarray(Ub, self.dtype))
        self.state = jax.block_until_ready(s)
        self.plan_np, self.meta = plan_np, meta
        return self.command_message()

    def command_message(self):
        """Build MHPC_Command_lcmt (MHPCLocomotion.cpp:190-287)."""
        n = self.n_cmd_steps
        plan = self.plan_np
        tr = self.state.traj
        Xbar = np.asarray(tr.Xbar)
        Ubar = np.asarray(tr.Ubar)
        Y = np.asarray(tr.Y)
        K = np.asarray(tr.K)
        Qu = np.asarray(tr.Qu)
        Quu = np.asarray(tr.Quu)
        Qux = np.asarray(tr.Qux)
        active = np.asarray(plan.step.active) > 0
        is_reset = np.asarray(plan.step.is_reset) > 0
        wb = np.asarray(plan.step.model_id) == 0
        idx = np.where(active & ~is_reset & wb)[0][:n]
        msg = w.MHPC_Command_lcmt(N_mpcsteps=len(idx))
        msg.mpc_times = self.mpc_time + np.asarray(plan.step.t)[idx]
        msg.torque = Ubar[idx]
        msg.pos = Xbar[idx][:, 0:3]
        msg.eul = Xbar[idx][:, 3:6]
        msg.qJ = Xbar[idx][:, 6:18]
        msg.vWorld = Xbar[idx][:, 18:21]
        msg.eulrate = Xbar[idx][:, 21:24]
        msg.qJd = Xbar[idx][:, 24:36]
        msg.GRF = Y[idx]
        msg.feedback = K[idx].reshape(len(idx), -1)
        msg.Qu = Qu[idx]
        msg.Quu = Quu[idx].reshape(len(idx), -1)
        msg.Qux = Qux[idx].reshape(len(idx), -1)
        msg.contacts = np.asarray(plan.step.contact)[idx].astype(np.int32)
        msg.statusTimes = np.zeros((len(idx), 4))
        return msg
