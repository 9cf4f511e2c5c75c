"""Solver-facing fused forward path for the HKD problem.

``make_hkd_fused_forward()`` returns a callable

    fused_forward(plan, pen, tr, x0, eps)
        -> (X, U, Xsim, Defect, cq, g, h, cost, feas, ok)

with semantics identical to the generic solver forward path
(hsddp.rollout + cost_terms + cost_from_terms over make_hkd_fns()):

  * un-batched (single-scenario MPC, tests): a plain-JAX implementation;
  * under the scenario vmap: ONE lane-batched Pallas kernel
    (ops/fused_hkd_trial.py) replacing the whole splintered XLA forward
    graph.

The search-direction control offset dU + K dX is precomputed here (it is
eps-independent, so XLA hoists it out of the line-search backtracking
loop — the generic path re-applies K to (X - Xbar) on every trial).
"""
import jax
import jax.numpy as jnp
from jax import custom_batching

from cafempc_tpu.models import hkd
from cafempc_tpu.ops import fused_hkd_trial as ft
from cafempc_tpu.solver import penalty
from cafempc_tpu.problems.hkd_problem import (GROUND_HEIGHT, MU_FRIC,
                                              _E_BLK, _E_TILE, _GU_CONST,
                                              _np_facets,
                                              _tracking_weights,
                                              _footreg_weights)


@custom_batching.custom_vmap
def _trial_op(eps, x0, Xbar, dX, Ubar, dUK,
              reb_delta, reb_eps, reb_act, al_lam, al_sig, al_act,
              xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3, swing3,
              td4, lo4, xref_k, qf_t, qfoot_t, prelref_t,
              dt_s, run_m, is_reset, prev_act, k_act, term_m):
    """Single-scenario fused trial (plain JAX fallback).

    Shapes: Xbar/dX [NK,24], Ubar/dUK [N,24], pen [N,20]/[NK,4], consts
    per-knot, masks [N]/[NK].  Returns (X, U, Xsim, Defect, g, h, cq,
    cost, feas, maxp, maxt, ok)."""
    NK = Xbar.shape[0]
    X = Xbar + eps * dX
    U = Ubar + eps * dUK

    def sim_one(x, u, dt, c3k, sw3, td, lo, isr):
        xn_dyn = hkd.dynamics(x, u * 1.0, dt,
                              c3k.reshape(4, 3)[:, 0])
        # reconstruct contact masks from the precomputed per-axis masks
        xn_res = hkd.reset_map_td_lo(x, td, lo)
        return jnp.where(isr > 0, xn_res, xn_dyn)

    Xsim_next = jax.vmap(sim_one)(X[:-1], U, dt_s, c3, swing3, td4, lo4,
                                  is_reset)
    Xsim_next = jnp.where(prev_act[1:, None] > 0, Xsim_next, X[1:])
    Xsim = jnp.concatenate([x0[None], Xsim_next], axis=0)
    Defect = (Xsim - X) * k_act[:, None]
    ok = jnp.all(jnp.isfinite(Xsim)) & (
        jnp.max(jnp.sum((Xsim * k_act[:, None]) ** 2, axis=-1)) < 1e12)

    # running cost
    dx = X[:-1] - xref_s
    du = U - uref_s
    l = 0.5 * jnp.sum(q_w * dx * dx, -1) + 0.5 * jnp.sum(r_w * du * du, -1)
    pcom = X[:, 3:6]
    prel = X[:, 12:24] - jnp.tile(pcom, (1, 4))
    d_r = prel[:-1] - prelref_r
    l = l + 0.5 * jnp.sum(qfoot_r * d_r * d_r, -1)
    cq = jnp.sum(run_m * dt_s * l)

    # terminal cost
    dxt = X - xref_k
    phi = 0.5 * jnp.sum(qf_t * dxt * dxt, -1)
    d_t = prel - prelref_t
    phi = phi + 10.0 * jnp.sum(qfoot_t * d_t * d_t, -1)
    cq = cq + jnp.sum(term_m * phi)

    # constraints + penalties
    g = jax.vmap(lambda u_: jnp.stack(
        ft._facet_rows(u_[0:12, None], MU_FRIC)[:, 0]))(U)
    gg = jnp.where(reb_act > 0, g, 1.0)
    quad = 0.5 * (jnp.square((gg - 2.0 * reb_delta) / reb_delta) - 1.0) \
        - jnp.log(reb_delta)
    logt = -jnp.log(jnp.where(gg > reb_delta, gg, 1.0))
    barr = jnp.where(gg > reb_delta, logt, quad)
    barr = jnp.where(reb_act > 0, barr, 0.0)
    cost = cq + jnp.sum(run_m * dt_s * jnp.sum(reb_eps * barr, -1))

    h = jax.vmap(hkd.foot_heights)(X) - GROUND_HEIGHT
    hh = jnp.where(al_act > 0, h, 0.0)
    al = jnp.sum(0.5 * al_sig * hh * hh + al_lam * hh, -1)
    cost = cost + jnp.sum(term_m * al)

    g_act = (reb_act > 0) & (run_m[:, None] > 0)
    maxp = jnp.minimum(jnp.min(jnp.where(g_act, g, 0.0)), 0.0)
    h_act = (al_act > 0) & (term_m[:, None] > 0)
    maxt = jnp.max(jnp.where(h_act, jnp.abs(h), 0.0))

    feas = jnp.sqrt(jnp.sum(Defect ** 2))
    # pad g to NK rows to match the kernel's output block layout
    g_pad = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)], 0)
    U_pad = jnp.concatenate([U, jnp.zeros((1, U.shape[1]), U.dtype)], 0)
    return (X, U_pad, Xsim, Defect, g_pad, h, cq, cost, feas, maxp, maxt,
            ok.astype(X.dtype))


@_trial_op.def_vmap
def _trial_op_vmap(axis_size, in_batched, eps, x0, Xbar, dX, Ubar, dUK,
                   reb_delta, reb_eps, reb_act, al_lam, al_sig, al_act,
                   xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3,
                   swing3, td4, lo4, xref_k, qf_t, qfoot_t, prelref_t,
                   dt_s, run_m, is_reset, prev_act, k_act, term_m):
    lane_args = (eps, x0, Xbar, dX, Ubar, dUK, reb_delta, reb_eps,
                 reb_act, al_lam, al_sig, al_act)
    const_args = (xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3,
                  swing3, td4, lo4, xref_k, qf_t, qfoot_t, prelref_t)
    n_lane = len(lane_args)
    assert not any(in_batched[n_lane:]), \
        "plan-derived constants must be unbatched"

    Bsz = axis_size
    block_l = 128
    pad = (-Bsz) % block_l
    L = Bsz + pad

    def lane(x, batched):
        if not batched:
            x = jnp.broadcast_to(x[None], (Bsz,) + x.shape)
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.repeat(x[..., :1], pad, axis=-1)], axis=-1)
        return x

    laned = [lane(a, b) for a, b in zip(lane_args, in_batched[:n_lane])]

    import numpy as np
    NK = Xbar.shape[1] if in_batched[2] else Xbar.shape[0]
    sp = jnp.stack([
        jnp.concatenate([dt_s, jnp.zeros(1, dt_s.dtype)]),
        jnp.concatenate([run_m, jnp.zeros(1, run_m.dtype)]),
        jnp.concatenate([is_reset, jnp.zeros(1, is_reset.dtype)]),
        prev_act, k_act, term_m], axis=1)

    out = ft.fused_hkd_trial(
        *laned, *const_args, sp, block_l=block_l, mu=MU_FRIC)

    def unlane(x):
        return jnp.moveaxis(x[..., :Bsz], -1, 0)

    res = tuple(unlane(o) for o in out[:6]) + tuple(
        unlane(o)[:, 0] for o in out[6:])
    return res, tuple([True] * 12)


def _plan_consts(plan, dtype):
    """Plan-derived per-knot constants shared by the fused forward and
    fused LQ paths (all pure functions of the plan — hoisted by XLA)."""
    sd, kd = plan.step, plan.knot
    q_w, r_w, _ = jax.vmap(_tracking_weights)(sd.contact)
    _, _, qf_t = jax.vmap(_tracking_weights)(kd.contact)
    qfoot_r = jax.vmap(_footreg_weights)(sd.contact)
    qfoot_t = jax.vmap(_footreg_weights)(kd.contact)
    prelref_r = sd.pf_ref - jnp.tile(sd.com_ref, (1, 4))
    prelref_t = kd.pf_ref - jnp.tile(kd.com_ref, (1, 4))
    c3 = jnp.repeat(sd.contact, 3, axis=1)
    swing3 = 1.0 - c3
    td4 = (1.0 - sd.contact) * sd.contact_next
    lo4 = sd.contact * (1.0 - sd.contact_next)
    run_m = sd.active * (1.0 - sd.is_reset)
    prev_act = jnp.concatenate(
        [jnp.ones((1,), dtype), sd.active])  # prev_act[k]=active[k-1]
    term_m = kd.active * kd.is_terminal
    return dict(q_w=q_w, r_w=r_w, qf_t=qf_t, qfoot_r=qfoot_r,
                qfoot_t=qfoot_t, prelref_r=prelref_r, prelref_t=prelref_t,
                c3=c3, swing3=swing3, td4=td4, lo4=lo4, run_m=run_m,
                prev_act=prev_act, term_m=term_m)


def make_hkd_fused_forward():
    """Returns fused_forward(plan, pen, tr, x0, eps) for make_solver."""

    def fused_forward(plan, pen, tr, x0, eps):
        sd, kd = plan.step, plan.knot
        dtype = tr.Xbar.dtype
        cc = _plan_consts(plan, dtype)
        (q_w, r_w, qf_t, qfoot_r, qfoot_t, prelref_r, prelref_t, c3,
         swing3, td4, lo4, run_m, prev_act, term_m) = (
            cc["q_w"], cc["r_w"], cc["qf_t"], cc["qfoot_r"], cc["qfoot_t"],
            cc["prelref_r"], cc["prelref_t"], cc["c3"], cc["swing3"],
            cc["td4"], cc["lo4"], cc["run_m"], cc["prev_act"], cc["term_m"])

        dUK = tr.dU + jnp.einsum("kij,kj->ki", tr.K, tr.dX[:-1])

        (X, U_pad, Xsim, Defect, g_pad, h, cq, cost, feas, maxp, maxt,
         okf) = _trial_op(
            jnp.asarray(eps, dtype), x0, tr.Xbar, tr.dX, tr.Ubar, dUK,
            pen.reb_delta, pen.reb_eps,
            jnp.asarray(pen.reb_active, dtype),
            pen.al_lambda, pen.al_sigma, jnp.asarray(pen.al_active, dtype),
            sd.x_ref, sd.u_ref, q_w, r_w, qfoot_r, prelref_r, c3, swing3,
            td4, lo4, kd.x_ref, qf_t, qfoot_t, prelref_t,
            sd.dt, run_m, sd.is_reset, prev_act, kd.active, term_m)

        tr2 = tr._replace(X=X, U=U_pad[:-1], Xsim=Xsim, Defect=Defect)
        return (tr2, (cq, g_pad[:-1], h), cost, feas, maxp, maxt,
                okf > 0.5)

    return fused_forward


# ---------------------------------------------------------------------
# Fused LQ approximation (ops/fused_hkd_lq.py)
# ---------------------------------------------------------------------

@custom_batching.custom_vmap
def _lq_op(X, U, reb_delta, reb_eps, reb_act, al_lam, al_sig, al_act,
           xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3, swing3,
           td4, lo4, xref_k, qf_t, qfoot_t, prelref_t,
           dt_s, run_m, is_reset, act_s, term_m):
    """Single-scenario LQ approximation (plain JAX fallback) with
    semantics identical to hsddp.lq_approx over make_hkd_fns():
    dynamics/reset Jacobians, ReB-folded running-cost partials, AL-folded
    terminal partials (SinglePhase.cpp:265-320).

    Returns (A [N,24,24], B, lx [N,24], lu, lxx, luu, phix [NK,24],
    phixx [NK,24,24]).
    """
    contact = c3.reshape(-1, 4, 3)[:, :, 0]
    A_d, B_d = jax.vmap(hkd.dynamics_partials)(X[:-1], U, dt_s, contact)
    P = jax.vmap(hkd.reset_map_partial_td_lo)(X[:-1], td4, lo4)
    isr = is_reset[:, None, None]
    act = act_s[:, None, None]
    A = jnp.where(isr > 0, P, A_d) * act
    B = jnp.where(isr > 0, jnp.zeros_like(B_d), B_d) * act

    # running-cost partials (HKDCost.h:8-100)
    dx = X[:-1] - xref_s
    du = U - uref_s
    lx = q_w * dx
    lu = r_w * du
    lxx = jax.vmap(jnp.diag)(q_w)
    luu = jax.vmap(jnp.diag)(r_w)
    # foot-place regularization: D = c3-masked (E_BLK - E_TILE)
    E = jnp.asarray(_E_BLK - _E_TILE, X.dtype)
    D = c3[:, :, None] * E[None]                      # [N, 12, 24]
    pcom = X[:, 3:6]
    prel = X[:, 12:24] - jnp.tile(pcom, (1, 4))
    d_r = prel[:-1] - prelref_r
    lx = lx + jnp.einsum("kji,kj->ki", D, qfoot_r * d_r)
    lxx = lxx + jnp.einsum("kji,kj,kjl->kil", D, qfoot_r, D)
    # ReB friction-pyramid Gauss-Newton terms (constant facet Jacobian)
    F = jnp.asarray(_np_facets(), X.dtype)
    g = jnp.einsum("fi,kli->klf", F,
                   U[:, 0:12].reshape(-1, 4, 3)).reshape(-1, 20)
    d1, d2 = penalty.reb_barrier_d(g, reb_delta, reb_act)
    gu = jnp.asarray(_GU_CONST, X.dtype)
    lu = lu + (reb_eps * d1) @ gu
    luu = luu + jnp.einsum("kf,fi,fj->kij", reb_eps * d2, gu, gu)
    rm = (run_m * dt_s)
    lx = lx * rm[:, None]
    lu = lu * rm[:, None]
    lxx = lxx * rm[:, None, None]
    luu = luu * rm[:, None, None]

    # terminal partials + AL touchdown (HKDConstraints.cpp:68-160)
    dxt = X - xref_k
    phix = qf_t * dxt
    phixx = jax.vmap(jnp.diag)(qf_t)
    d_t = prel - prelref_t
    # qfoot_t already carries the contact mask (0/1), so the unmasked E
    # placement is identical to _dprel_dx(kd.contact)
    phix = phix + 20.0 * jnp.einsum("ji,kj->ki", E, qfoot_t * d_t)
    phixx = phixx + 20.0 * jnp.einsum("kj,ji,jl->kil", qfoot_t, E, E)
    h = jax.vmap(hkd.foot_heights)(X) - GROUND_HEIGHT
    hx = jax.vmap(hkd.touchdown_height_partials)(X)
    ag, ah = jax.vmap(penalty.al_partials)(h, hx, al_lam, al_sig, al_act)
    phix = (phix + ag) * term_m[:, None]
    phixx = (phixx + ah) * term_m[:, None, None]
    return A, B, lx, lu, lxx, luu, phix, phixx


@_lq_op.def_vmap
def _lq_op_vmap(axis_size, in_batched, X, U, reb_delta, reb_eps, reb_act,
                al_lam, al_sig, al_act,
                xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3, swing3,
                td4, lo4, xref_k, qf_t, qfoot_t, prelref_t,
                dt_s, run_m, is_reset, act_s, term_m):
    from cafempc_tpu.ops.fused_hkd_lq import fused_hkd_lq
    lane_args = (X, U, reb_delta, reb_eps, reb_act, al_lam, al_sig,
                 al_act)
    const_args = (xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3,
                  swing3, td4, lo4, xref_k, qf_t, qfoot_t, prelref_t)
    n_lane = len(lane_args)
    assert not any(in_batched[n_lane:]), \
        "plan-derived constants must be unbatched"

    Bsz = axis_size
    block_l = 128
    pad = (-Bsz) % block_l

    def lane(x, batched):
        if not batched:
            x = jnp.broadcast_to(x[None], (Bsz,) + x.shape)
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.repeat(x[..., :1], pad, axis=-1)], axis=-1)
        return x

    laned = [lane(a, b) for a, b in zip(lane_args, in_batched[:n_lane])]

    z1 = jnp.zeros((1,), dt_s.dtype)
    sp = jnp.stack([
        jnp.concatenate([dt_s, z1]),
        jnp.concatenate([run_m, z1]),
        jnp.concatenate([is_reset, z1]),
        jnp.concatenate([act_s, z1]),
        term_m], axis=1)

    out = fused_hkd_lq(*laned, *const_args, sp, block_l=block_l,
                       mu=MU_FRIC)

    def unlane(x):
        return jnp.moveaxis(x[..., :Bsz], -1, 0)

    N = dt_s.shape[0]
    A, B, lx, lu, lxx, luu, phix, phixx = out
    res = (unlane(A[:N]), unlane(B[:N]), unlane(lx[:N]), unlane(lu[:N]),
           unlane(lxx[:N]), unlane(luu[:N]), unlane(phix), unlane(phixx))
    return res, tuple([True] * 8)


def make_hkd_fused_lq():
    """Returns fused_lq(plan, pen, tr) for make_solver(..., fused_lq=...):
    the whole LQ approximation (dynamics + reset Jacobians, ReB-folded
    running-cost partials, AL-folded terminal partials) in ONE
    lane-batched Pallas kernel under the scenario vmap, with a plain-JAX
    per-scenario fallback (ops/fused_hkd_lq.py)."""

    def fused_lq(plan, pen, tr):
        sd, kd = plan.step, plan.knot
        dtype = tr.Xbar.dtype
        cc = _plan_consts(plan, dtype)
        A, B, lx, lu, lxx, luu, phix, phixx = _lq_op(
            tr.X, tr.U, pen.reb_delta, pen.reb_eps,
            jnp.asarray(pen.reb_active, dtype), pen.al_lambda,
            pen.al_sigma, jnp.asarray(pen.al_active, dtype),
            sd.x_ref, sd.u_ref, cc["q_w"], cc["r_w"], cc["qfoot_r"],
            cc["prelref_r"], cc["c3"], cc["swing3"], cc["td4"], cc["lo4"],
            kd.x_ref, cc["qf_t"], cc["qfoot_t"], cc["prelref_t"],
            sd.dt, cc["run_m"], sd.is_reset, sd.active, cc["term_m"])
        return tr._replace(A=A, B=B, lx=lx, lu=lu, lxx=lxx, luu=luu,
                           phix=phix, phixx=phixx)

    return fused_lq
