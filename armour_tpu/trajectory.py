"""Reference-trajectory evaluation with the braking fallback.

The runtime twin of uarmtd_planner.desired_trajectory ('bernstein' branch,
uarmtd_planner.m:889-925): given the plan anchor state (q0, qd0, qdd0) and
the chosen trajectory parameter k (NaN if the last plan was infeasible), the
desired state at time t since the plan anchor is

  * the degree-5 Bezier toward q0 + k*k_range if k is finite;
  * else: replay the PREVIOUS plan's trajectory shifted forward by t_plan —
    its second half ends at rest, which IS the braking maneuver (the safety
    fallback the reachable sets already certified);
  * if already stopped, hold position.

A plan state is carried as a PlanRef pytree so the whole closed loop stays
jittable: instead of a closure chain (the reference keeps a cell array of
anonymous functions), we keep the previous plan's anchor explicitly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import bezier
from .config import ArmourConfig


@dataclasses.dataclass
class PlanRef:
    """Anchor state + parameter of the active plan and its predecessor."""

    q0: jnp.ndarray       # [F] anchor position of active plan
    qd0: jnp.ndarray
    qdd0: jnp.ndarray
    k_act: jnp.ndarray    # [F] actual (scaled) trajectory parameter; NaN = brake
    prev_q0: jnp.ndarray  # previous plan anchor (for the braking replay)
    prev_qd0: jnp.ndarray
    prev_qdd0: jnp.ndarray
    prev_k_act: jnp.ndarray


jax.tree_util.register_dataclass(
    PlanRef,
    data_fields=["q0", "qd0", "qdd0", "k_act", "prev_q0", "prev_qd0", "prev_qdd0", "prev_k_act"],
    meta_fields=[],
)


def initial_plan(q0, dtype=jnp.float32) -> PlanRef:
    q0 = jnp.asarray(q0, dtype)
    z = jnp.zeros_like(q0)
    return PlanRef(
        q0=q0, qd0=z, qdd0=z, k_act=z,
        prev_q0=q0, prev_qd0=z, prev_qdd0=z, prev_k_act=z,
    )


def advance_plan(ref: PlanRef, k_new, q0, qd0, qdd0, cfg: ArmourConfig) -> PlanRef:
    """Accept a new plan anchored at (q0, qd0, qdd0) with parameter k_new in
    [-1,1]^F (NaN if infeasible -> braking)."""
    if cfg.traj_family == "armtd":
        # velocity-adaptive parameter range (create_jrs_online.m:77) — must
        # match build_jrs_armtd's scaling at the same anchor velocity
        from .armtd import g_k_adaptive

        scale = g_k_adaptive(jnp.asarray(qd0, ref.q0.dtype))
    else:
        scale = jnp.asarray(cfg.k_range, ref.q0.dtype)
    k_act = jnp.asarray(k_new) * scale
    return PlanRef(
        q0=jnp.asarray(q0, ref.q0.dtype),
        qd0=jnp.asarray(qd0, ref.q0.dtype),
        qdd0=jnp.asarray(qdd0, ref.q0.dtype),
        k_act=k_act,
        prev_q0=ref.q0,
        prev_qd0=ref.qd0,
        prev_qdd0=ref.qdd0,
        prev_k_act=ref.k_act,
    )


def _bezier_state(q0, qd0, qdd0, k_act, t, cfg: ArmourConfig):
    dur = cfg.duration
    s = jnp.clip(t / dur, 0.0, 1.0)
    Tqd0 = qd0 * dur
    TTqdd0 = qdd0 * dur * dur
    q = bezier.q_des(q0, Tqd0, TTqdd0, k_act, s)
    qd = bezier.qd_des(q0, Tqd0, TTqdd0, k_act, s) / dur
    qdd = bezier.qdd_des(q0, Tqd0, TTqdd0, k_act, s) / (dur * dur)
    return q, qd, qdd


def _armtd_state(q0, qd0, qdd0, k_act, t, cfg: ArmourConfig):
    """Constant-acceleration reference (armtd Trajectory.h:6-16): accelerate
    at k for t <= t_plan, then brake linearly to rest at `duration`.  Past
    the horizon the state holds at the final rest position (qd(ts) = 0 by
    construction).  qdd0 is unused — the family's acceleration IS k."""
    del qdd0
    tp, ts = cfg.t_plan, cfg.duration
    t = jnp.clip(t, 0.0, ts)
    qd_pk = qd0 + k_act * tp
    brk = -qd_pk / (ts - tp)
    q1 = q0 + qd0 * t + 0.5 * k_act * t * t
    qd1 = qd0 + k_act * t
    tau = t - tp
    q_pk = q0 + qd0 * tp + 0.5 * k_act * tp * tp
    q2 = q_pk + qd_pk * tau + 0.5 * brk * tau * tau
    qd2 = qd_pk + brk * tau
    ph2 = t > tp
    q = jnp.where(ph2, q2, q1)
    qd = jnp.where(ph2, qd2, qd1)
    qdd = jnp.where(ph2, brk, k_act)
    return q, qd, qdd


def desired_state(ref: PlanRef, t, cfg: ArmourConfig):
    """(q_des, qd_des, qdd_des) at time t since the active plan's anchor
    (uarmtd_planner.m:889-925 'bernstein' branch; :871-886 'orig' branch for
    the armtd family — both brake by replaying the previous plan shifted
    forward by t_plan)."""
    state = _armtd_state if cfg.traj_family == "armtd" else _bezier_state
    ok = jnp.all(jnp.isfinite(ref.k_act))
    k_act = jnp.where(ok, ref.k_act, 0.0)
    q_n, qd_n, qdd_n = state(ref.q0, ref.qd0, ref.qdd0, k_act, t, cfg)

    # braking: replay previous plan shifted by t_plan
    prev_ok = jnp.all(jnp.isfinite(ref.prev_k_act))
    pk = jnp.where(prev_ok, ref.prev_k_act, 0.0)
    q_b, qd_b, qdd_b = state(
        ref.prev_q0, ref.prev_qd0, ref.prev_qdd0, pk, t + cfg.t_plan, cfg
    )
    moving = jnp.linalg.norm(ref.qd0) > 1e-8
    brake_active = moving & (t <= cfg.t_plan) & prev_ok
    q_hold = ref.q0
    z = jnp.zeros_like(ref.q0)
    q_f = jnp.where(brake_active, q_b, q_hold)
    qd_f = jnp.where(brake_active, qd_b, z)
    qdd_f = jnp.where(brake_active, qdd_b, z)

    q = jnp.where(ok, q_n, q_f)
    qd = jnp.where(ok, qd_n, qd_f)
    qdd = jnp.where(ok, qdd_n, qdd_f)
    return q, qd, qdd
