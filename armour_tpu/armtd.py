"""ARMTD comparison planner: constant-acceleration trajectory family.

The original ARMTD baseline the reference keeps for paper comparisons
(kinova_planner_realtime_armtd_comparison/): the trajectory applies constant
acceleration k for t in [0, t_plan], then brakes to rest at t_stop
(armtd Trajectory.h:6-16):

    phase 1 (t <= tp):  q = q0 + qd0 t + 1/2 k t^2
    phase 2 (t > tp):   q = q_pk + qd_pk tau - 1/2 (qd_pk/(ts-tp)) tau^2,
                        tau = t - tp,  qd_pk = qd0 + k tp

k ranges over +- g_k with the velocity-adaptive scale
g_k = min(max(pi/24, |qd0|/3), pi/3) (create_jrs_online.m:77).  The reference
loads offline CORA-computed JRS zonotopes binned by initial velocity
(load_offline_jrs.m); here the same sets are computed ONLINE in closed form —
both q(t;k) and its derivatives are affine in k with piecewise-quadratic time
coefficients, so exact per-sub-interval bounds come from endpoints + the one
interior vertex.  Everything downstream (PZ FK/RNEA, collision, NLP) is
shared with the ARMOUR pipeline.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .collision import BIG, ObstacleSet
from .config import ArmourConfig
from .jrs import (
    JRS, TrajectoryCoeffs, assemble_rotations, make_velocity_pz, trig_taylor_pz,
)
from .pz.basis import KBasis
from .robot import RobotModel

PI = math.pi


def g_k_adaptive(qd0):
    """Velocity-adaptive parameter range (create_jrs_online.m:77)."""
    return jnp.minimum(jnp.maximum(PI / 24, jnp.abs(qd0) / 3.0), PI / 3.0)


def _phase_coeffs(t, qd0, tp, ts):
    """(a, b) with q(t;k) = q0 + a(t) + b(t) k, piecewise in t.  t: [T, 1]."""
    tau = t - tp
    brk = 1.0 / (ts - tp)
    a1 = qd0 * t
    b1 = 0.5 * t * t
    a2 = qd0 * tp + qd0 * tau - 0.5 * qd0 * brk * tau * tau
    b2 = 0.5 * tp * tp + tp * tau - 0.5 * tp * brk * tau * tau
    ph2 = t > tp
    return jnp.where(ph2, a2, a1), jnp.where(ph2, b2, b1)


def _phase_vel(t, qd0, tp, ts):
    """(a', b'): qd = qd0' + a'(t) + b'(t) k."""
    tau = t - tp
    brk = 1.0 / (ts - tp)
    a1 = qd0 + 0.0 * t
    b1 = t
    a2 = qd0 * (1.0 - brk * tau)
    b2 = tp * (1.0 - brk * tau)
    ph2 = t > tp
    return jnp.where(ph2, a2, a1), jnp.where(ph2, b2, b1)


def _phase_acc(t, qd0, tp, ts):
    tau0 = jnp.zeros_like(t)
    brk = 1.0 / (ts - tp)
    ph2 = t > tp
    a = jnp.where(ph2, -qd0 * brk, tau0)
    b = jnp.where(ph2, -tp * brk + tau0, 1.0 + tau0)
    return a, b


def build_jrs_armtd(q0, qd0, robot: RobotModel, cfg: ArmourConfig,
                    basis: KBasis) -> JRS:
    """Online JRS for the constant-acceleration family.  The time grid spans
    [0, t_stop = duration]; T must be even so the phase boundary at t_plan
    aligns with the grid."""
    dt = cfg.dtype
    T = cfg.num_time_steps
    ub = cfg.ub
    tp = cfg.t_plan
    ts = cfg.duration

    q0 = jnp.asarray(q0, dt)
    qd0 = jnp.asarray(qd0, dt)
    gk = g_k_adaptive(qd0)

    step = ts / T
    t1 = (jnp.arange(T, dtype=dt) * step)[:, None]
    t2 = t1 + step

    # both a and b are monotone within each phase (SURVEY 2.1 armtd row), and
    # sub-intervals never straddle tp for even T, so endpoint bounds are exact
    a_lo, b_lo = _phase_coeffs(t1, qd0, tp, ts)
    a_hi, b_hi = _phase_coeffs(t2, qd0, tp, ts)
    a1, a2 = jnp.minimum(a_lo, a_hi), jnp.maximum(a_lo, a_hi)
    b1, b2 = jnp.minimum(b_lo, b_hi), jnp.maximum(b_lo, b_hi)
    qc = q0 + (a1 + a2) * 0.5
    Rq = (a2 - a1) * 0.5 + (b2 - b1) * 0.5 * gk + ub.qe
    kd_scaled = (b1 + b2) * 0.5 * gk
    cos_c, cos_k, cos_e, sin_c, sin_k, sin_e = trig_taylor_pz(qc, Rq, kd_scaled)

    va_lo, vb_lo = _phase_vel(t1, qd0, tp, ts)
    va_hi, vb_hi = _phase_vel(t2, qd0, tp, ts)
    va1, va2 = jnp.minimum(va_lo, va_hi), jnp.maximum(va_lo, va_hi)
    vb1, vb2 = jnp.minimum(vb_lo, vb_hi), jnp.maximum(vb_lo, vb_hi)
    qd_center = (va1 + va2) * 0.5
    vd_center = (vb1 + vb2) * 0.5 * gk
    v_rad = (va2 - va1) * 0.5 + (vb2 - vb1) * 0.5 * gk

    aa_lo, ab_lo = _phase_acc(t1 + 1e-9, qd0, tp, ts)  # open at the boundary
    aa_hi, ab_hi = _phase_acc(t2, qd0, tp, ts)
    aa1, aa2 = jnp.minimum(aa_lo, aa_hi), jnp.maximum(aa_lo, aa_hi)
    ab1, ab2 = jnp.minimum(ab_lo, ab_hi), jnp.maximum(ab_lo, ab_hi)
    qdd_center = (aa1 + aa2) * 0.5
    ad_center = (ab1 + ab2) * 0.5 * gk
    a_rad = (aa2 - aa1) * 0.5 + (ab2 - ab1) * 0.5 * gk

    qd_pz = make_velocity_pz(qd_center, vd_center, v_rad + ub.qde, "qde", basis, dt)
    qda_pz = make_velocity_pz(qd_center, vd_center, v_rad + ub.qdae, "qdae", basis, dt)
    qdda_pz = make_velocity_pz(qdd_center, ad_center, a_rad + ub.qddae, "qddae", basis, dt)
    R, Rt = assemble_rotations(
        robot, cos_c, cos_k, cos_e, sin_c, sin_k, sin_e, basis, dt
    )

    traj = TrajectoryCoeffs(
        q0=q0, qd0=qd0, qdd0=jnp.zeros_like(q0),
        Tqd0=qd0 * ts, TTqdd0=jnp.zeros_like(q0),
        k_scale=gk, family="armtd",
    )
    return JRS(R=R, Rt=Rt, qd=qd_pz, qda=qda_pz, qdda=qdda_pz, traj=traj)


# --- state-limit extrema for the constant-acceleration family ---------------


def armtd_position_extrema(k, traj: TrajectoryCoeffs, cfg: ArmourConfig):
    tp, ts = cfg.t_plan, cfg.duration
    k_act = k * traj.k_scale
    q0, qd0 = traj.q0, traj.qd0
    qd_pk = qd0 + k_act * tp

    v0 = q0
    v_tp = q0 + qd0 * tp + 0.5 * k_act * tp * tp
    v_ts = v_tp + 0.5 * qd_pk * (ts - tp)
    # interior vertex of phase 1 at t* = -qd0 / k
    tstar = jnp.where(jnp.abs(k_act) > 1e-12, -qd0 / jnp.where(jnp.abs(k_act) > 1e-12, k_act, 1.0), -1.0)
    v_star = q0 + qd0 * tstar + 0.5 * k_act * tstar * tstar
    inside = (0.0 < tstar) & (tstar < tp)

    cands = jnp.stack([v0, v_tp, v_ts, v_star])
    # d(value)/d(k_act): b(t) at each candidate (envelope theorem at t*)
    g = jnp.stack([
        jnp.zeros_like(k), 0.5 * tp * tp + jnp.zeros_like(k),
        0.5 * tp * tp + 0.5 * tp * (ts - tp) + jnp.zeros_like(k),
        0.5 * tstar * tstar,
    ])
    ok = jnp.stack([
        jnp.ones_like(k, bool), jnp.ones_like(k, bool), jnp.ones_like(k, bool),
        inside,
    ])
    lo_c = jnp.where(ok, cands, BIG)
    hi_c = jnp.where(ok, cands, -BIG)
    i_lo = jnp.argmin(lo_c, axis=0)
    i_hi = jnp.argmax(hi_c, axis=0)
    q_min = jnp.take_along_axis(lo_c, i_lo[None], axis=0)[0]
    q_max = jnp.take_along_axis(hi_c, i_hi[None], axis=0)[0]
    g_min = jnp.take_along_axis(g, i_lo[None], axis=0)[0] * traj.k_scale
    g_max = jnp.take_along_axis(g, i_hi[None], axis=0)[0] * traj.k_scale
    return q_min, q_max, g_min, g_max


def armtd_velocity_extrema(k, traj: TrajectoryCoeffs, cfg: ArmourConfig):
    tp = cfg.t_plan
    k_act = k * traj.k_scale
    qd0 = traj.qd0
    qd_pk = qd0 + k_act * tp
    z = jnp.zeros_like(k)
    cands = jnp.stack([qd0, qd_pk, z])
    g = jnp.stack([z, tp + z, z])
    i_lo = jnp.argmin(cands, axis=0)
    i_hi = jnp.argmax(cands, axis=0)
    qd_min = jnp.take_along_axis(cands, i_lo[None], axis=0)[0]
    qd_max = jnp.take_along_axis(cands, i_hi[None], axis=0)[0]
    g_min = jnp.take_along_axis(g, i_lo[None], axis=0)[0] * traj.k_scale
    g_max = jnp.take_along_axis(g, i_hi[None], axis=0)[0] * traj.k_scale
    return qd_min, qd_max, g_min, g_max


def plan_step_armtd(q0, qd0, q_des, obs: ObstacleSet, robot: RobotModel,
                    cfg: ArmourConfig, basis: KBasis, k0=None):
    """One ARMTD planning iteration (armtd_main.cu equivalent)."""
    from .collision import build_hyperplanes, screen_collision
    from .dynamics import torque_frs
    from .kinematics import forward_occupancy, reduce_links
    from .nlp import PlanProblem, solve

    jrs = build_jrs_armtd(q0, qd0, robot, cfg, basis)
    links = forward_occupancy(jrs, robot, cfg, basis)
    frs = reduce_links(links, basis)
    torque = torque_frs(jrs, robot, cfg, basis)
    hyp = build_hyperplanes(frs, obs)
    screened = screen_collision(hyp, obs, frs, cfg.screen_k,
                                cfg.screen_obstacle_quota)
    prob = PlanProblem(
        traj=jrs.traj, q_des=jnp.asarray(q_des, cfg.dtype), torque=torque,
        frs=frs, hyp=hyp, obs=obs, screened=screened,
    )
    return solve(prob, robot, cfg, basis, k0=k0)
