"""Fused HKD line-search trial: rollout + cost + constraint values in ONE
lane-batched Pallas kernel.

The solver's forward path (trial rollout, running/terminal cost, ReB/AL
penalty folding, defect/feasibility reductions) is elementwise per knot,
but in the batch-first [B, N, d] layout every 3-wide rotation / foot-FK
intermediate occupies 3 of 128 lanes (~2% utilization) and the XLA graph
splinters into dozens of tiny fusions + layout copies (~half the solve
time in the round-2 trace).  Here the scenario batch rides the 128 lanes
([N, d, L]) and one kernel walks the knots with the simulated state
carried in VMEM, emitting everything the line search needs:

    X, U, Xsim, Defect   (trial trajectory, multiple-shooting defects)
    g, h                 (path / terminal constraint values)
    cq                   (penalty-independent cost)
    cost                 (total cost incl. ReB/AL folding)
    feas, maxp, maxt, ok (reductions)

Semantics mirror the generic solver path exactly (hsddp.rollout +
cost_terms + cost_from_terms with the HKD problem functions of
problems/hkd_problem.py; reference analogues SinglePhase.cpp:182-262):
verified by tests/test_fused_trial.py.  f32 sums accumulate in knot order
(vs XLA's reduction tree), so scalars match to float tolerance only.

Model math ported from models/hkd.py (dynamics, reset_map, foot_heights)
and solver/penalty.py (reb/al costs) — reference kernels `hkinodyn`
(HKDModel.h:33-45), HKDReset.h:41-75, HKDConstraints.cpp:17-120.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cafempc_tpu.models.hkd import (GRAVITY, HIP_X, HIP_Y, INERTIA_DIAG,
                                    L1, L2, L3, MASS, QLEG_DEFAULT,
                                    SIDE_SIGN)

# plain-python copies of the leg constants: pallas kernels must not close
# over device arrays
_SIDE = [float(v) for v in np.asarray(SIDE_SIGN)]
_HX = [float(v) for v in np.asarray(HIP_X)]
_HY = [float(v) for v in np.asarray(HIP_Y)]
_IDIAG = [float(v) for v in np.asarray(INERTIA_DIAG)]
_QDEF = [float(v) for v in np.asarray(QLEG_DEFAULT)]

MU_FRIC_DEFAULT = 0.5


def _interpret():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------
# lane-vectorized model pieces (operate on (d, L) arrays)
# ---------------------------------------------------------------------

def _rot_rows(eul):
    """Rows of R = Rz(yaw) Ry(pitch) Rx(roll); eul (3, L) -> list of 3
    rows, each a list of 3 lane vectors."""
    sy, cy = jnp.sin(eul[0]), jnp.cos(eul[0])
    sp, cp = jnp.sin(eul[1]), jnp.cos(eul[1])
    sr, cr = jnp.sin(eul[2]), jnp.cos(eul[2])
    return [
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ]


def _legs_fk_rows(qd):
    """leg_fk_local for all 4 legs; qd (12, L) joint angles ->
    p_local as [4][3] lane vectors (models/hkd.py:_legs_fk_local)."""
    out = []
    for leg in range(4):
        q0, q1, q2 = qd[3 * leg], qd[3 * leg + 1], qd[3 * leg + 2]
        s1, c1 = jnp.sin(q0), jnp.cos(q0)
        s2, c2 = jnp.sin(q1), jnp.cos(q1)
        s3, c3 = jnp.sin(q2), jnp.cos(q2)
        s23 = s2 * c3 + c2 * s3
        c23 = c2 * c3 - s2 * s3
        sig = _SIDE[leg]
        ext = L3 * c23 + L2 * c2
        px = _HX[leg] + L3 * s23 + L2 * s2
        py = _HY[leg] + sig * L1 * c1 + s1 * ext
        pz = sig * L1 * s1 - c1 * ext
        out.append([px, py, pz])
    return out


def _matvec3(R, v):
    """R: [3][3] lane rows, v: [3] lane vectors -> [3] lane vectors."""
    return [R[i][0] * v[0] + R[i][1] * v[1] + R[i][2] * v[2]
            for i in range(3)]


def _matTvec3(R, v):
    return [R[0][i] * v[0] + R[1][i] * v[1] + R[2][i] * v[2]
            for i in range(3)]


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _hkd_step_sim(X, U, dt, c3, swing3, td4, lo4, is_reset):
    """One HKD step: forward-Euler dynamics or reset map, lane-batched.
    X (24, L), U (24, L); dt/is_reset scalars; c3/swing3 (12,) constants;
    td4/lo4 (4,) constants.  Returns xnext (24, L)."""
    eul = X[0:3]
    pos = X[3:6]
    omega = X[6:9]
    vel = X[9:12]
    qd = X[12:24]
    grf = U[0:12] * c3[:, None]

    R = _rot_rows(eul)

    # --- dynamics branch (models/hkd.py:dynamics_continuous) ---------
    f = [[grf[3 * l + i] for i in range(3)] for l in range(4)]
    f_tot = [sum(f[l][i] for l in range(4)) for i in range(3)]
    tau_w = [jnp.zeros_like(X[0])] * 3
    for l in range(4):
        arm = [qd[3 * l] - pos[0], qd[3 * l + 1] - pos[1], -pos[2]]
        tw = _cross(arm, f[l])
        tau_w = [tau_w[i] + tw[i] for i in range(3)]
    tau_b = _matTvec3(R, tau_w)
    Idiag = _IDIAG
    Iw = [Idiag[i] * omega[i] for i in range(3)]
    wxIw = _cross([omega[0], omega[1], omega[2]], Iw)
    omega_dot = [(tau_b[i] - wxIw[i]) / Idiag[i] for i in range(3)]
    v_dot = [f_tot[0] / MASS, f_tot[1] / MASS,
             f_tot[2] / MASS - GRAVITY]
    # euld = W(eul) @ omega
    sp, cp = jnp.sin(eul[1]), jnp.cos(eul[1])
    sr, cr = jnp.sin(eul[2]), jnp.cos(eul[2])
    euld = [(sr * omega[1] + cr * omega[2]) / cp,
            cr * omega[1] - sr * omega[2],
            omega[0] + sp * (sr * omega[1] + cr * omega[2]) / cp]
    qdd = U[12:24] * swing3[:, None]
    xdot = jnp.concatenate([
        jnp.stack(euld), X[9:12], jnp.stack(omega_dot),
        jnp.stack(v_dot), qdd], axis=0)
    xn_dyn = X + dt * xdot

    # --- reset branch (models/hkd.py:reset_map) ----------------------
    p_loc = _legs_fk_rows(qd)
    q_rows = []
    for l in range(4):
        pw = _matvec3(R, p_loc[l])
        td, lo = td4[l], lo4[l]
        keep = 1.0 - td - lo
        qleg = [qd[3 * l], qd[3 * l + 1], qd[3 * l + 2]]
        qdef = _QDEF
        q_rows += [td * (pos[0] + pw[0]) + lo * qdef[0] + keep * qleg[0],
                   td * (pos[1] + pw[1]) + lo * qdef[1] + keep * qleg[1],
                   lo * qdef[2] + keep * qleg[2]]  # pf z zeroed
    xn_res = jnp.concatenate([X[0:12], jnp.stack(q_rows)], axis=0)
    return jnp.where(is_reset > 0, xn_res, xn_dyn)


def _foot_heights_rows(X):
    """foot z for 4 legs treating qdummy as joint angles
    (models/hkd.py:foot_heights): h_l = pos_z + R[2,:] . p_local_l."""
    eul = X[0:3]
    sp, cp = jnp.sin(eul[1]), jnp.cos(eul[1])
    sr, cr = jnp.sin(eul[2]), jnp.cos(eul[2])
    r2 = [-sp, cp * sr, cp * cr]
    p_loc = _legs_fk_rows(X[12:24])
    return [X[5] + r2[0] * p_loc[l][0] + r2[1] * p_loc[l][1]
            + r2[2] * p_loc[l][2] for l in range(4)]


def _facet_rows(grf, mu):
    """Friction-pyramid values per leg (HKDConstraints.cpp:17-53):
    [fz, -fx+mu fz, fx+mu fz, -fy+mu fz, fy+mu fz] x 4 legs -> (20, L)."""
    rows = []
    for l in range(4):
        fx, fy, fz = grf[3 * l], grf[3 * l + 1], grf[3 * l + 2]
        rows += [fz, -fx + mu * fz, fx + mu * fz, -fy + mu * fz,
                 fy + mu * fz]
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------
# scalar-prefetch flag columns (per knot k = 0..N)
_SP_DT = 0          # step dt (k<N)
_SP_RUN = 1         # run-cost mask: active*(1-is_reset) (k<N)
_SP_RESET = 2       # step is_reset (k<N)
_SP_PREV_ACT = 3    # step active of step k-1
_SP_KACT = 4        # knot active
_SP_TERM = 5        # terminal mask: knot active*is_terminal
_SP_NCOLS = 6


def _trial_kernel(n_knots, mu):
    N = n_knots - 1

    def kernel(sp_ref,
               eps_ref, x0_ref, Xbar_ref, dX_ref, Ubar_ref, dUK_ref,
               rdel_ref, reps_ref, ract_ref, alam_ref, asig_ref, aact_ref,
               xref_s_ref, uref_s_ref, qw_ref, rw_ref, qfoot_r_ref,
               prelref_r_ref, c3_ref, swing3_ref, td4_ref, lo4_ref,
               xref_k_ref, qft_ref, qfoot_t_ref, prelref_t_ref,
               X_ref, U_ref, Xsim_ref, Defect_ref, g_ref, h_ref,
               cq_ref, cost_ref, feas_ref, maxp_ref, maxt_ref, ok_ref,
               sim_s, cq_s, cost_s, feas_s, maxp_s, maxt_s, okf_s, m2_s):
        k = pl.program_id(1)
        dt = sp_ref[k, _SP_DT]
        run_m = sp_ref[k, _SP_RUN]
        is_reset = sp_ref[k, _SP_RESET]
        prev_act = sp_ref[k, _SP_PREV_ACT]
        k_act = sp_ref[k, _SP_KACT]
        term_m = sp_ref[k, _SP_TERM]

        @pl.when(k == 0)
        def _init():
            cq_s[:] = jnp.zeros_like(cq_s)
            cost_s[:] = jnp.zeros_like(cost_s)
            feas_s[:] = jnp.zeros_like(feas_s)
            maxp_s[:] = jnp.zeros_like(maxp_s)
            maxt_s[:] = jnp.zeros_like(maxt_s)
            okf_s[:] = jnp.ones_like(okf_s)
            m2_s[:] = jnp.zeros_like(m2_s)

        eps = eps_ref[0]                       # (L,)
        Xk = Xbar_ref[0] + eps[None, :] * dX_ref[0]          # (24, L)
        Uk = Ubar_ref[0] + eps[None, :] * dUK_ref[0]

        # ---- Xsim / defect ------------------------------------------
        # jnp.where, NOT arithmetic selects: at k=0 the sim scratch is
        # uninitialized and 0 * NaN would poison Xsim.
        xsim = jnp.where(k == 0, x0_ref[:],
                         jnp.where(prev_act > 0, sim_s[:], Xk))
        defect = k_act * (xsim - Xk)
        X_ref[0] = Xk
        U_ref[0] = Uk
        Xsim_ref[0] = xsim
        Defect_ref[0] = defect
        feas_s[:] = feas_s[:] + jnp.sum(defect * defect, axis=0)[None, :]
        fin = jnp.all(jnp.isfinite(xsim), axis=0).astype(Xk.dtype)
        okf_s[:] = okf_s[:] * fin[None, :]
        m2_s[:] = jnp.maximum(
            m2_s[:], (k_act * jnp.sum(xsim * xsim, axis=0))[None, :])

        # ---- running cost + path constraints (k < N; masked) --------
        dx = Xk - xref_s_ref[0, 0][:, None]
        du = Uk - uref_s_ref[0, 0][:, None]
        l_run = 0.5 * jnp.sum(qw_ref[0, 0][:, None] * dx * dx, axis=0) \
            + 0.5 * jnp.sum(rw_ref[0, 0][:, None] * du * du, axis=0)
        pcom = Xk[3:6]
        prel = Xk[12:24] - jnp.concatenate([pcom, pcom, pcom, pcom], 0)
        d_r = prel - prelref_r_ref[0, 0][:, None]
        l_run = l_run + 0.5 * jnp.sum(qfoot_r_ref[0, 0][:, None] * d_r * d_r,
                                      axis=0)
        cq_s[:] = cq_s[:] + (run_m * dt * l_run)[None, :]

        g = _facet_rows(Uk[0:12], mu)                        # (20, L)
        g_ref[0] = g
        ract = ract_ref[0]
        delta = rdel_ref[0]
        gg = jnp.where(ract > 0, g, 1.0)
        quad = 0.5 * (jnp.square((gg - 2.0 * delta) / delta) - 1.0) \
            - jnp.log(delta)
        logt = -jnp.log(jnp.where(gg > delta, gg, 1.0))
        barr = jnp.where(gg > delta, logt, quad)
        barr = jnp.where(ract > 0, barr, 0.0)
        reb = jnp.sum(reps_ref[0] * barr, axis=0)
        cost_s[:] = cost_s[:] + (run_m * dt * reb)[None, :]
        g_act = (ract > 0) & (run_m > 0)
        maxp_s[:] = jnp.minimum(
            maxp_s[:], jnp.min(jnp.where(g_act, g, 0.0), axis=0)[None, :])

        # ---- terminal cost + AL constraints (masked by term_m) ------
        dxt = Xk - xref_k_ref[0, 0][:, None]
        phi = 0.5 * jnp.sum(qft_ref[0, 0][:, None] * dxt * dxt, axis=0)
        d_t = prel - prelref_t_ref[0, 0][:, None]
        phi = phi + 10.0 * jnp.sum(qfoot_t_ref[0, 0][:, None] * d_t * d_t,
                                   axis=0)
        cq_s[:] = cq_s[:] + (term_m * phi)[None, :]

        h = jnp.stack(_foot_heights_rows(Xk), axis=0)        # (4, L)
        h_ref[0] = h
        aact = aact_ref[0]
        hh = jnp.where(aact > 0, h, 0.0)
        al = jnp.sum(0.5 * asig_ref[0] * hh * hh + alam_ref[0] * hh,
                     axis=0)
        cost_s[:] = cost_s[:] + (term_m * al)[None, :]
        h_act = (aact > 0) & (term_m > 0)
        maxt_s[:] = jnp.maximum(
            maxt_s[:],
            jnp.max(jnp.where(h_act, jnp.abs(h), 0.0), axis=0)[None, :])

        # ---- simulate this step for the next knot's defect ----------
        sim_s[:] = _hkd_step_sim(Xk, Uk, dt, c3_ref[0, 0], swing3_ref[0, 0],
                                 td4_ref[0, 0], lo4_ref[0, 0], is_reset)

        @pl.when(k == N)
        def _finalize():
            cq_ref[:] = cq_s[:]
            cost_ref[:] = cost_s[:] + cq_s[:]
            feas_ref[:] = jnp.sqrt(feas_s[:])
            maxp_ref[:] = jnp.minimum(maxp_s[:], 0.0)
            maxt_ref[:] = maxt_s[:]
            ok_ref[:] = okf_s[:] * (m2_s[:] < 1e12).astype(okf_s.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("block_l", "mu"))
def fused_hkd_trial(eps, x0, Xbar, dX, Ubar, dUK,
                    reb_delta, reb_eps, reb_act, al_lam, al_sig, al_act,
                    xref_s, uref_s, q_w, r_w, qfoot_r, prelref_r, c3,
                    swing3, td4, lo4, xref_k, qf_t, qfoot_t, prelref_t,
                    sp, block_l=128, mu=MU_FRIC_DEFAULT):
    """Lane-batched operands; NK = N+1 knots, L lanes.

    eps [L]; x0 [24,L]; Xbar/dX [NK,24,L]; Ubar/dUK [N,24,L];
    reb_* [N,20,L]; al_* [NK,4,L]; per-knot constants unbatched
    (xref_s [N,24], ..., xref_k [NK,24], ...); sp [NK,_SP_NCOLS] f32
    scalar-prefetch flags.
    Returns (X, U, Xsim, Defect [NK,24,L], g [NK,20,L] (row N invalid),
    h [NK,4,L], cq, cost, feas, maxp, maxt, ok [1,L]).
    """
    NK = Xbar.shape[0]
    N = NK - 1
    L = Xbar.shape[2]
    assert L % block_l == 0
    dt = Xbar.dtype
    n_lb = L // block_l

    def lane_blk(d, arr_len, clamp=False):
        if clamp:
            return pl.BlockSpec((1, d, block_l),
                                lambda lb, k, *_: (jnp.minimum(k, N - 1), 0, lb),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, d, block_l), lambda lb, k, *_: (k, 0, lb),
                            memory_space=pltpu.VMEM)

    def const_blk(d, clamp=False):
        # per-knot constants ship as [N, 1, d] so the block's last two
        # dims (1, d) equal the array dims (Mosaic requires divisibility
        # by (8, 128) OR equality for the trailing two dims)
        if clamp:
            return pl.BlockSpec((1, 1, d),
                                lambda lb, k, *_: (jnp.minimum(k, N - 1),
                                                   0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, d), lambda lb, k, *_: (k, 0, 0),
                            memory_space=pltpu.VMEM)

    fix = lambda d: pl.BlockSpec((d, block_l), lambda lb, k, *_: (0, lb),
                                 memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_lb, NK),
        in_specs=[
            fix(1),                      # eps
            fix(24),                     # x0
            lane_blk(24, NK),            # Xbar
            lane_blk(24, NK),            # dX
            lane_blk(24, N, clamp=True),     # Ubar
            lane_blk(24, N, clamp=True),     # dUK
            lane_blk(20, N, clamp=True),     # reb_delta
            lane_blk(20, N, clamp=True),     # reb_eps
            lane_blk(20, N, clamp=True),     # reb_act
            lane_blk(4, NK),             # al_lam
            lane_blk(4, NK),             # al_sig
            lane_blk(4, NK),             # al_act
            const_blk(24, clamp=True),   # xref_s
            const_blk(24, clamp=True),   # uref_s
            const_blk(24, clamp=True),   # q_w
            const_blk(24, clamp=True),   # r_w
            const_blk(12, clamp=True),   # qfoot_r
            const_blk(12, clamp=True),   # prelref_r
            const_blk(12, clamp=True),   # c3
            const_blk(12, clamp=True),   # swing3
            const_blk(4, clamp=True),    # td4
            const_blk(4, clamp=True),    # lo4
            const_blk(24),               # xref_k
            const_blk(24),               # qf_t
            const_blk(12),               # qfoot_t
            const_blk(12),               # prelref_t
        ],
        out_specs=[
            lane_blk(24, NK), lane_blk(24, NK), lane_blk(24, NK),
            lane_blk(24, NK), lane_blk(20, NK), lane_blk(4, NK),
            fix(1), fix(1), fix(1), fix(1), fix(1), fix(1),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, block_l), dt),   # sim carry
            pltpu.VMEM((1, block_l), dt),    # cq
            pltpu.VMEM((1, block_l), dt),    # penalty cost
            pltpu.VMEM((1, block_l), dt),    # feas (sum sq)
            pltpu.VMEM((1, block_l), dt),    # maxp (min)
            pltpu.VMEM((1, block_l), dt),    # maxt (max)
            pltpu.VMEM((1, block_l), dt),    # ok finite flag
            pltpu.VMEM((1, block_l), dt),    # max state norm
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NK, 24, L), dt),
        jax.ShapeDtypeStruct((NK, 24, L), dt),
        jax.ShapeDtypeStruct((NK, 24, L), dt),
        jax.ShapeDtypeStruct((NK, 24, L), dt),
        jax.ShapeDtypeStruct((NK, 20, L), dt),
        jax.ShapeDtypeStruct((NK, 4, L), dt),
    ] + [jax.ShapeDtypeStruct((1, L), dt)] * 6
    return pl.pallas_call(
        _trial_kernel(NK, mu),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray(sp, jnp.float32).astype(dt),
      eps.reshape(1, L), x0, Xbar, dX, Ubar, dUK,
      reb_delta, reb_eps, reb_act, al_lam, al_sig, al_act,
      xref_s[:, None], uref_s[:, None], q_w[:, None], r_w[:, None],
      qfoot_r[:, None], prelref_r[:, None], c3[:, None], swing3[:, None],
      td4[:, None], lo4[:, None], xref_k[:, None], qf_t[:, None],
      qfoot_t[:, None], prelref_t[:, None])
