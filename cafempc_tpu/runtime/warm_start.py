"""Time-aligned warm start shared by the MHPC and HKD runtimes.

The reference gets warm starting for free from its shifted phase deques
(MHPCProblem.cpp:274-397, HKDProblem.cpp:117-222); here the plan is
rebuilt on the host every MPC step, so the previous solution is mapped
onto the new plan by absolute knot time (+ model id for the cascade).

Vectorized: per model segment, one sort of the old knot times + one
searchsorted over the new ones — O(N log N) instead of a per-knot
candidate scan (hostile at the cascade500 horizon).  Semantics match the
scan it replaced: a new knot takes the LAST old active knot with the same
model id whose time is within 1e-6 (knot times sit on a dt grid, so ties
are exact duplicates at phase boundaries and ordering by (t, index)
picks the post-reset knot, as the scan's cand[-1] did).  Unit-tested
identical to the per-knot scan in tests/test_mhpc_runtime.py.
"""
import numpy as np


def warm_start_indices(old_knot, old_shift, new_knot, new_shift):
    """Index mapping (src, dst) of old plan knots onto new plan knots by
    absolute time + model id.  Plan-determined only — the same mapping
    applies to every scenario of a batch (tools/scenario_sweep.py MPC
    chains apply it to [B, N, xs] arrays at once)."""
    old_t = np.asarray(old_knot.t) + old_shift
    old_active = np.asarray(old_knot.active) > 0
    old_model = np.asarray(old_knot.model_id)
    new_t = np.asarray(new_knot.t) + new_shift
    new_active = np.asarray(new_knot.active) > 0
    new_model = np.asarray(new_knot.model_id)
    srcs, dsts = [], []
    for m in np.unique(new_model[new_active]):
        oi = np.where(old_active & (old_model == m))[0]
        if not len(oi):
            continue
        order = np.lexsort((oi, old_t[oi]))
        oi_s = oi[order]
        ot_s = old_t[oi][order]
        nj = np.where(new_active & (new_model == m))[0]
        hi = np.searchsorted(ot_s, new_t[nj] + 1e-6, side="right")
        ok = hi > 0
        hit = np.clip(hi - 1, 0, len(ot_s) - 1)
        ok &= np.abs(ot_s[hit] - new_t[nj]) < 1e-6
        srcs.append(oi_s[hit[ok]])
        dsts.append(nj[ok])
    if not srcs:
        return np.zeros(0, int), np.zeros(0, int)
    return np.concatenate(srcs), np.concatenate(dsts)


def time_aligned_warm_start(old_knot, old_shift, oXb, oUb,
                            new_knot, new_shift, Xbar0, Ubar0):
    """Map (oXb, oUb) from the old plan's knots onto the new plan's.

    old_knot/new_knot: KnotData (host numpy views are taken);
    old_shift/new_shift: absolute time of each plan's t=0.
    Returns (Xb, Ub) — copies of Xbar0/Ubar0 with matched rows replaced.
    """
    src, dst = warm_start_indices(old_knot, old_shift, new_knot,
                                  new_shift)
    Xb, Ub = Xbar0.copy(), Ubar0.copy()
    Xb[dst] = oXb[src]
    um = (dst < len(Ub)) & (src < len(oUb))
    Ub[dst[um]] = oUb[src[um]]
    return Xb, Ub
