"""Degree-5 Bezier (Bernstein) trajectory closed forms.

The trajectory runs from (q0, qd0, qdd0) at s=0 to rest at q0 + k_actual at
s=1, s = t / DURATION (Trajectory.h:10-30).  Control points:

    beta0 = q0
    beta1 = q0 + Tqd0/5
    beta2 = q0 + 2*Tqd0/5 + TTqdd0/20
    beta3 = beta4 = beta5 = q0 + k_actual

with Tqd0 = qd0*T, TTqdd0 = qdd0*T^2 (Trajectory.cu:542-599).

All functions are elementwise over arrays and autodiff-able; gradients of the
state-limit extrema come from jax.grad instead of the reference's 200-line
machine-generated derivative expressions (Trajectory.cu:601-810).
"""

from __future__ import annotations

import jax.numpy as jnp


def q_des(q0, Tqd0, TTqdd0, k_actual, s):
    """Position at normalized time s in [0, 1] (Trajectory.cu:542-556)."""
    b0 = -((s - 1.0) ** 5)
    b1 = 5.0 * s * (s - 1.0) ** 4
    b2 = -10.0 * s**2 * (s - 1.0) ** 3
    b3 = 10.0 * s**3 * (s - 1.0) ** 2
    b4 = -5.0 * s**4 * (s - 1.0)
    b5 = s**5
    beta0 = q0
    beta1 = q0 + Tqd0 / 5.0
    beta2 = q0 + 2.0 * Tqd0 / 5.0 + TTqdd0 / 20.0
    beta3 = q0 + k_actual
    return b0 * beta0 + b1 * beta1 + b2 * beta2 + (b3 + b4 + b5) * beta3


def qd_des(q0, Tqd0, TTqdd0, k_actual, s):
    """d(q_des)/ds (divide by DURATION for real-time velocity;
    Trajectory.cu:558-572)."""
    db0 = -5.0 * (s - 1.0) ** 4
    db1 = 20.0 * s * (s - 1.0) ** 3 + 5.0 * (s - 1.0) ** 4
    db2 = -20.0 * s * (s - 1.0) ** 3 - 30.0 * s**2 * (s - 1.0) ** 2
    db3 = 10.0 * s**3 * (2.0 * s - 2.0) + 30.0 * s**2 * (s - 1.0) ** 2
    db4 = -20.0 * s**3 * (s - 1.0) - 5.0 * s**4
    db5 = 5.0 * s**4
    beta0 = q0
    beta1 = q0 + Tqd0 / 5.0
    beta2 = q0 + 2.0 * Tqd0 / 5.0 + TTqdd0 / 20.0
    beta3 = q0 + k_actual
    return db0 * beta0 + db1 * beta1 + db2 * beta2 + (db3 + db4 + db5) * beta3


def qdd_des(q0, Tqd0, TTqdd0, k_actual, s):
    """d2(q_des)/ds2 (divide by DURATION^2; Trajectory.cu:574-599)."""
    t5 = s - 1.0
    t8 = t5 * t5
    t9 = t8 * t5
    ddb0 = -20.0 * t9
    ddb1 = 40.0 * t9 + 60.0 * s * t8
    ddb2 = -20.0 * t9 - 120.0 * s * t8 - 30.0 * s**2 * (2.0 * s - 2.0)
    ddb3 = 20.0 * s**3 + 60.0 * s * t8 + 60.0 * s**2 * (2.0 * s - 2.0)
    ddb4 = -40.0 * s**3 - 60.0 * s**2 * t5
    ddb5 = 20.0 * s**3
    beta0 = q0
    beta1 = q0 + Tqd0 / 5.0
    beta2 = q0 + 2.0 * Tqd0 / 5.0 + TTqdd0 / 20.0
    beta3 = q0 + k_actual
    return ddb0 * beta0 + ddb1 * beta1 + ddb2 * beta2 + (ddb3 + ddb4 + ddb5) * beta3


# --- k-independent parts (k term removed; Trajectory.cu:812-822) -----------


def q_des_k_indep(q0, Tqd0, TTqdd0, s):
    return (
        q0
        + Tqd0 * s
        - 6.0 * Tqd0 * s**3
        + 8.0 * Tqd0 * s**4
        - 3.0 * Tqd0 * s**5
        + 0.5 * TTqdd0 * s**2
        - 1.5 * TTqdd0 * s**3
        + 1.5 * TTqdd0 * s**4
        - 0.5 * TTqdd0 * s**5
    )


def qd_des_k_indep(q0, Tqd0, TTqdd0, s, duration=1.0):
    return (
        0.5
        * (s - 1.0) ** 2
        * (2.0 * Tqd0 + 4.0 * Tqd0 * s + 2.0 * TTqdd0 * s - 30.0 * Tqd0 * s**2 - 5.0 * TTqdd0 * s**2)
        / duration
    )


def qdd_des_k_indep(q0, Tqd0, TTqdd0, s, duration=1.0):
    return (
        -(s - 1.0)
        * (TTqdd0 - (36.0 * Tqd0 + 8.0 * TTqdd0) * s + (60.0 * Tqd0 + 10.0 * TTqdd0) * s**2)
        / (duration * duration)
    )


# --- interior critical points of the k-independent parts -------------------
# Closed-form roots used to bound each part over a sub-interval
# (Trajectory.cu:36-61).  Denominators vanish at rest starts; callers filter
# with (s_lb < root < s_ub) which is False for nan/inf.


def q_des_k_indep_extrema(Tqd0, TTqdd0):
    den = 5.0 * (6.0 * Tqd0 + TTqdd0)
    disc = jnp.sqrt(64.0 * Tqd0**2 + 14.0 * Tqd0 * TTqdd0 + TTqdd0**2)
    e1 = (2.0 * Tqd0 + TTqdd0 + disc) / den
    e2 = (2.0 * Tqd0 + TTqdd0 - disc) / den
    return e1, e2


def qd_des_k_indep_extrema(Tqd0, TTqdd0):
    den = 10.0 * (6.0 * Tqd0 + TTqdd0)
    disc = jnp.sqrt(6.0 * (54.0 * Tqd0**2 + 14.0 * Tqd0 * TTqdd0 + TTqdd0**2))
    e1 = (18.0 * Tqd0 + 4.0 * TTqdd0 + disc) / den
    e2 = (18.0 * Tqd0 + 4.0 * TTqdd0 - disc) / den
    return e1, e2


def qdd_des_k_indep_extrema(Tqd0, TTqdd0):
    den = 10.0 * (6.0 * Tqd0 + TTqdd0)
    disc = jnp.sqrt(2.0 * (152.0 * Tqd0**2 + 42.0 * Tqd0 * TTqdd0 + 3.0 * TTqdd0**2))
    e1 = (32.0 * Tqd0 + 6.0 * TTqdd0 + disc) / den
    e2 = (32.0 * Tqd0 + 6.0 * TTqdd0 - disc) / den
    return e1, e2


# --- whole-trajectory extrema in k (state-limit constraints) ---------------
# Roots of qd_des(s)=0 resp. qdd_des(s)=0 as functions of k
# (Trajectory.cu:256-330,399-420).


def q_extrema_in_k(Tqd0, TTqdd0, k_actual):
    den = 5.0 * (6.0 * Tqd0 - 12.0 * k_actual + TTqdd0)
    disc_sq = 64.0 * Tqd0**2 + 14.0 * Tqd0 * TTqdd0 - 120.0 * k_actual * Tqd0 + TTqdd0**2
    disc = jnp.sqrt(jnp.maximum(disc_sq, 0.0))
    valid = disc_sq >= 0.0
    e2 = (2.0 * Tqd0 + TTqdd0 + disc) / den
    e3 = (2.0 * Tqd0 + TTqdd0 - disc) / den
    return e2, e3, valid


def qd_extrema_in_k(Tqd0, TTqdd0, k_actual):
    den = 10.0 * (6.0 * Tqd0 - 12.0 * k_actual + TTqdd0)
    disc_sq = 6.0 * (
        150.0 * k_actual**2
        - 180.0 * k_actual * Tqd0
        - 20.0 * k_actual * TTqdd0
        + 54.0 * Tqd0**2
        + 14.0 * Tqd0 * TTqdd0
        + TTqdd0**2
    )
    disc = jnp.sqrt(jnp.maximum(disc_sq, 0.0))
    valid = disc_sq >= 0.0
    e2 = (18.0 * Tqd0 - 30.0 * k_actual + 4.0 * TTqdd0 + disc) / den
    e3 = (18.0 * Tqd0 - 30.0 * k_actual + 4.0 * TTqdd0 - disc) / den
    return e2, e3, valid
