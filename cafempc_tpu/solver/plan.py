"""Flat, statically-shaped multi-phase knot plans.

The reference represents a multi-phase OCP as a deque of heterogeneous
`SinglePhase` objects that grow/shrink every MPC update
(MHPCProblem.cpp:252-397, HKDProblem.cpp:117-222).  That is hostile to XLA:
shapes change every 20 ms and phase structure is data-dependent.

Here the whole multi-phase problem is flattened into fixed-size per-step /
per-knot arrays:

  * ``N_STEPS`` slots, each either a dynamics step, a reset step (phase
    boundary: the reference's resetmap + impact-aware value propagation,
    MultiPhaseDDP.cpp:49-92 & 499-503), or inactive padding;
  * phase-terminal knots carry terminal costs + AL terminal constraints
    (SinglePhase.cpp:323-327 initialises each phase's sweep with them);
  * every quantity a cost/constraint queries from the reference manager at
    ``t_offset + k*dt`` is pre-gathered into the plan on the host
    (x_ref/u_ref/foot refs/contact/...), so the jitted solve never touches
    host data.

Receding-horizon updates rebuild these arrays (cheap numpy work) into the
SAME shapes, so the compiled solver is reused across the whole MPC run.
"""
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class StepData(NamedTuple):
    """Per-step arrays; leading dim = n_steps (padded)."""
    active: jnp.ndarray        # [N] 1.0 if the step is used
    is_reset: jnp.ndarray      # [N] 1.0 if reset step (phase boundary)
    dt: jnp.ndarray            # [N]
    t: jnp.ndarray             # [N] plan-relative time of the step start
    contact: jnp.ndarray       # [N, 4] stance mask during the step
    contact_next: jnp.ndarray  # [N, 4] next-phase contact (reset steps)
    x_ref: jnp.ndarray         # [N, xs]
    u_ref: jnp.ndarray         # [N, us]
    y_ref: jnp.ndarray         # [N, ys]
    pf_ref: jnp.ndarray        # [N, 12] reference foot placements
    com_ref: jnp.ndarray       # [N, 3] reference CoM position
    vf_ref: jnp.ndarray        # [N, 12] reference foot velocities
    ref_contact: jnp.ndarray   # [N, 4] contact of the reference record at t
    model_id: jnp.ndarray      # [N] 0 = primary model, 1 = tail model (SRB)
    model_switch: jnp.ndarray  # [N] 1 at the cascade model-switch reset step
    q_diag: jnp.ndarray        # [N, xs] per-step tracking weights (or [N,0])
    r_diag: jnp.ndarray        # [N, us] per-step control weights (or [N,0])


class KnotData(NamedTuple):
    """Per-knot arrays; leading dim = n_steps + 1."""
    active: jnp.ndarray        # [N+1]
    is_terminal: jnp.ndarray   # [N+1] phase-terminal (incl. final knot)
    td_mask: jnp.ndarray       # [N+1, 4] touchdown legs at this knot
    contact: jnp.ndarray       # [N+1, 4] contact of the phase ending here
    ref_contact: jnp.ndarray   # [N+1, 4] reference-record contact at t
    model_id: jnp.ndarray      # [N+1] model owning this knot
    qf_diag: jnp.ndarray       # [N+1, xs] per-knot terminal weights ([N+1,0])
    x_ref: jnp.ndarray         # [N+1, xs] terminal state reference
    pf_ref: jnp.ndarray        # [N+1, 12]
    com_ref: jnp.ndarray       # [N+1, 3]
    t: jnp.ndarray             # [N+1]


class KnotPlan(NamedTuple):
    step: StepData
    knot: KnotData

    @property
    def n_steps(self):
        return self.step.active.shape[0]


class PenaltyParams(NamedTuple):
    """AL / ReB parameter state (updated across outer iterations).

    reb_*: [N, n_pcon]; al_*: [N+1, n_tcon]; *_active are 0/1 masks fixed
    by the plan structure.
    """
    reb_delta: jnp.ndarray
    reb_eps: jnp.ndarray
    reb_active: jnp.ndarray
    reb_delta_min: jnp.ndarray   # scalar or [n_pcon]
    al_lambda: jnp.ndarray
    al_sigma: jnp.ndarray
    al_active: jnp.ndarray
    al_sigma_max: jnp.ndarray    # scalar or [n_tcon]


def host_plan_to_device(plan_np, dtype=jnp.float32):
    """Convert a host-side (numpy) KnotPlan to device arrays of `dtype`."""
    def conv(x):
        x = np.asarray(x)
        if x.dtype.kind == "f":
            return jnp.asarray(x, dtype=dtype)
        return jnp.asarray(x)
    step = StepData(*[conv(a) for a in plan_np.step])
    knot = KnotData(*[conv(a) for a in plan_np.knot])
    return KnotPlan(step, knot)
