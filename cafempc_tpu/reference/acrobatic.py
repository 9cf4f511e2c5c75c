"""Acrobatic reference generation: in-place barrel roll.

Re-implementation of the reference's acrobatic generators
(scripts/Reference_python/barrel_roll.py + gen_barrel.py): the CoM follows
a ballistic arc during flight (projectile_pos/vel, utils.py:16-26), the
roll angle ramps 0 -> 2*pi across the flight window, legs tuck at a fixed
joint posture, and the schedule is stance -> flight -> stance.

Produces QuadReferenceData in the same record layout as the regular-gait
generator, writable via reference.generator.write_quad_reference_csv.
"""
import numpy as np

from cafempc_tpu.reference.generator import (DEFAULT_FOOTHOLDS, TOTAL_MASS,
                                             G, make_leg_ik)
from cafempc_tpu.reference.quad_reference import QuadReferenceData

import jax.numpy as jnp


def projectile_z(T, t):
    """Ballistic height profile with apex h = g*T^2/8 (utils.py:16-20)."""
    h = 9.81 * T * T / 8.0
    a = -4.0 * h / (T * T)
    return a * t * (t - T)


def projectile_vz(T, t):
    h = 9.81 * T * T / 8.0
    a = -4.0 * h / (T * T)
    return a * (2 * t - T)


def generate_barrel_roll_reference(pre_stance=0.5, flight=0.45,
                                   post_stance=1.0, z_des=0.24, dt=0.01,
                                   qJ_tuck=(0.0, -1.2, 2.4), model=None):
    """In-place barrel roll: roll 0 -> 2*pi during flight on a ballistic
    CoM arc.  Returns QuadReferenceData."""
    T_total = pre_stance + flight + post_stance
    N = int(round(T_total / dt)) + 1
    ik = make_leg_ik(model)
    qJ_stand = np.tile([0.0, -0.8, 1.6], 4)
    qJ_tuck4 = np.tile(qJ_tuck, 4)

    recs = dict(body_state=[], qJ=[], qJd=[], foot_placements=[],
                foot_velocities=[], foot_heights=[], grf=[], torque=[],
                contact=[], status_dur=[])
    pf_stand = (np.array([0.0, 0.0, z_des]) + DEFAULT_FOOTHOLDS).copy()
    pf_stand[:, 2] = 0.0
    qJ_prev = jnp.asarray(qJ_stand)
    for k in range(N):
        t = k * dt
        in_flight = pre_stance <= t < pre_stance + flight
        tf = t - pre_stance
        if in_flight:
            z = z_des + projectile_z(flight, tf)
            vz = projectile_vz(flight, tf)
            roll = 2.0 * np.pi * tf / flight
            rolld = 2.0 * np.pi / flight
            contact = np.zeros(4, dtype=np.int32)
            grf = np.zeros(12)
            qJ = qJ_tuck4
            sdur = np.full(4, flight)
        else:
            z = z_des
            vz = 0.0
            roll = 0.0 if t < pre_stance else 2.0 * np.pi
            rolld = 0.0
            contact = np.ones(4, dtype=np.int32)
            grf = np.zeros(12)
            grf[2::3] = TOTAL_MASS * G / 4.0
            qJ = None   # from IK below
            sdur = np.full(4, pre_stance if t < pre_stance else post_stance)
        pos = np.array([0.0, 0.0, z])
        eul = np.array([0.0, 0.0, roll])
        vel = np.array([0.0, 0.0, vz])
        eulrate = np.array([0.0, 0.0, rolld])
        pf = pf_stand.reshape(12).copy()
        if qJ is None:
            qJ = np.asarray(ik(jnp.asarray(pos), jnp.asarray(eul),
                               jnp.asarray(pf), qJ_prev))
            qJ_prev = jnp.asarray(qJ)
        recs["body_state"].append(np.concatenate([pos, eul, vel, eulrate]))
        recs["qJ"].append(np.asarray(qJ))
        recs["qJd"].append(np.zeros(12))
        recs["foot_placements"].append(pf)
        recs["foot_velocities"].append(np.zeros(12))
        recs["foot_heights"].append(pf[2::3].copy())
        recs["grf"].append(grf)
        recs["torque"].append(np.zeros(12))
        recs["contact"].append(contact)
        recs["status_dur"].append(sdur)

    return QuadReferenceData(
        dt=dt, **{k: np.asarray(v) for k, v in recs.items()})
