"""Numeric (pointwise) passivity-form RNEA, batched and jit-able.

The runtime twin of the PZ RNEA in dynamics.py: identical recursion evaluated
at concrete joint states.  Serves three roles the reference spreads across
rnea.m / rnea_mass.m / rnea_coriolis.m / rnea_gravity.m (MATLAB) and the mex
controller's passRNEA (kinova_robust_controllers_mex/src/rnea.cpp:6-99):

  * ground-truth oracle for PZ containment tests (debug_script.m analog),
  * nominal torque inside the robust CBF controller,
  * mass/Coriolis/gravity decomposition for the simulated plant dynamics.

All functions broadcast over leading batch dims and differentiate cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .robot import RobotModel


def _axis_rot(axis: int, q):
    """Rotation about coordinate axis (1/2/3 = x/y/z) by angle q; batched."""
    c, s = jnp.cos(q), jnp.sin(q)
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    if axis == 1:
        rows = [[o, z, z], [z, c, -s], [z, s, c]]
    elif axis == 2:
        rows = [[c, z, s], [z, o, z], [-s, z, c]]
    elif axis == 3:
        rows = [[c, -s, z], [s, c, z], [z, z, o]]
    else:
        raise ValueError(axis)
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def joint_rotations(robot: RobotModel, q):
    """R_i = RPY_i @ Rot_axis(q_i): [..., J, 3, 3] (Trajectory.cu:136-144)."""
    rotm = jnp.asarray(robot.rot_mats, q.dtype)
    Rs = []
    for i in range(robot.num_joints):
        axis = int(robot.axes[i])
        if axis == 0 or i >= robot.num_factors:
            R = jnp.broadcast_to(rotm[i], q.shape[:-1] + (3, 3))
        else:
            sgn = 1.0 if axis > 0 else -1.0
            R = jnp.einsum("ab,...bc->...ac", rotm[i], _axis_rot(abs(axis), sgn * q[..., i]))
        Rs.append(R)
    return jnp.stack(Rs, axis=-3)


def forward_kinematics(robot: RobotModel, q):
    """World rotation + position of each joint frame and link box center.

    Returns (R_w [..., J, 3, 3], p_w [..., J, 3], link_centers [..., J, 3]).
    """
    Rs = joint_rotations(robot, q)
    trans = jnp.asarray(robot.trans, q.dtype)
    link_c = jnp.asarray(robot.link_center, q.dtype)
    fk_r = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape[:-1] + (3, 3))
    fk_t = jnp.zeros(q.shape[:-1] + (3,), q.dtype)
    R_out, p_out, c_out = [], [], []
    for i in range(robot.num_joints):
        fk_t = fk_t + jnp.einsum("...ab,b->...a", fk_r, trans[i])
        fk_r = jnp.einsum("...ab,...bc->...ac", fk_r, Rs[..., i, :, :])
        R_out.append(fk_r)
        p_out.append(fk_t)
        c_out.append(fk_t + jnp.einsum("...ab,b->...a", fk_r, link_c[i]))
    return (
        jnp.stack(R_out, axis=-3),
        jnp.stack(p_out, axis=-2),
        jnp.stack(c_out, axis=-2),
    )


def rnea(robot: RobotModel, q, qd, qd_aux, qdd, *,
         mass=None, com=None, inertia=None,
         set_gravity: bool = True, include_armature: bool = True,
         wrench_at=None):
    """Passivity-form RNEA torque [..., F] (Dynamics.cu:83-181 semantics).

    mass/com/inertia default to the robot's nominal values; pass perturbed
    arrays for true-parameter or interval-sample evaluations.
    wrench_at: optional chain index — also return the backward-recursion
    joint wrench (f, n) at that body (contact wrench ground truth for
    grasp.py; Dynamics_sav.cu f_c/n_c).
    """
    dt = q.dtype
    J = robot.num_joints
    mass = jnp.asarray(robot.mass if mass is None else mass, dt)
    com = jnp.asarray(robot.com if com is None else com, dt)
    inertia = jnp.asarray(robot.inertia if inertia is None else inertia, dt)
    trans = jnp.asarray(robot.trans, dt)
    batch = q.shape[:-1]

    Rs = joint_rotations(robot, q)

    w = jnp.zeros(batch + (3,), dt)
    w_aux = jnp.zeros(batch + (3,), dt)
    wdot = jnp.zeros(batch + (3,), dt)
    lin_acc = jnp.zeros(batch + (3,), dt)
    if set_gravity:
        lin_acc = lin_acc.at[..., 2].set(robot.gravity)

    Fs, Ns = [], []
    for i in range(J):
        Rt = jnp.swapaxes(Rs[..., i, :, :], -1, -2)
        mv = lambda M, v: jnp.einsum("...ab,...b->...a", M, v)
        lin_acc = mv(Rt, lin_acc + jnp.cross(wdot, trans[i]) + jnp.cross(w, jnp.cross(w_aux, trans[i])))
        w = mv(Rt, w)
        w_aux = mv(Rt, w_aux)
        wdot = mv(Rt, wdot)
        axis = int(robot.axes[i])
        if axis != 0 and i < robot.num_factors:
            ax = abs(axis) - 1
            e = jnp.zeros((3,), dt).at[ax].set(1.0 if axis > 0 else -1.0)
            w = w + e * qd[..., i, None]
            wdot = wdot + jnp.cross(w_aux, e * qd[..., i, None]) + e * qdd[..., i, None]
            w_aux = w_aux + e * qd_aux[..., i, None]
        mb = mass[..., i] if mass.ndim > 1 else mass[i]
        cb = com[..., i, :] if com.ndim > 2 else com[i]
        Ib = inertia[..., i, :, :] if inertia.ndim > 3 else inertia[i]
        Fs.append(
            mb[..., None] * (lin_acc + jnp.cross(wdot, cb) + jnp.cross(w, jnp.cross(w_aux, cb)))
        )
        Ns.append(
            jnp.einsum("...ab,...b->...a", Ib, wdot)
            + jnp.cross(w_aux, jnp.einsum("...ab,...b->...a", Ib, w))
        )

    f = jnp.zeros(batch + (3,), dt)
    n = jnp.zeros(batch + (3,), dt)
    taus = [None] * robot.num_factors
    wrench = None
    for i in reversed(range(J)):
        if i + 1 < J:
            R_ip1 = Rs[..., i + 1, :, :]
        else:
            R_ip1 = jnp.broadcast_to(jnp.eye(3, dtype=dt), batch + (3, 3))
        cb = com[..., i, :] if com.ndim > 2 else com[i]
        rf = jnp.einsum("...ab,...b->...a", R_ip1, f)
        n = (
            Ns[i]
            + jnp.einsum("...ab,...b->...a", R_ip1, n)
            + jnp.cross(jnp.broadcast_to(cb, batch + (3,)), Fs[i])
            + jnp.cross(jnp.broadcast_to(trans[i + 1], batch + (3,)), rf)
        )
        f = rf + Fs[i]
        if wrench_at is not None and i == wrench_at:
            wrench = (f, n)
        axis = int(robot.axes[i])
        if axis != 0 and i < robot.num_factors:
            ax = abs(axis) - 1
            # signed e . n projection — matches the PZ-RNEA (dynamics.py
            # bwd_body); robots with negative axis codes (KUKA iiwa) flip sign
            tau = (1.0 if axis > 0 else -1.0) * n[..., ax]
            if include_armature:
                tau = tau + robot.armature[i] * qdd[..., i]
            if robot.damping[i] != 0.0:
                tau = tau + robot.damping[i] * qd[..., i]
            taus[i] = tau
    out = jnp.stack(taus, axis=-1)
    if wrench_at is not None:
        return out, wrench[0], wrench[1]
    return out


def mass_matrix(robot: RobotModel, q, *, mass=None, com=None, inertia=None,
                include_armature: bool = True):
    """M(q) columnwise via RNEA with unit accelerations (rnea_mass.m)."""
    F = robot.num_factors
    # one batched RNEA over the F unit-acceleration directions
    eye = jnp.eye(F, dtype=q.dtype)
    bq = jnp.broadcast_to(q[..., None, :], q.shape[:-1] + (F, F))
    bz = jnp.zeros_like(bq)
    bqdd = jnp.broadcast_to(eye, q.shape[:-1] + (F, F))
    cols = rnea(robot, bq, bz, bz, bqdd, mass=mass, com=com,
                inertia=inertia, set_gravity=False,
                include_armature=include_armature)
    return jnp.swapaxes(cols, -1, -2)


def coriolis_gravity(robot: RobotModel, q, qd, *, mass=None, com=None, inertia=None):
    """C(q, qd) qd + g(q) combined bias torque (rnea_coriolis/gravity.m)."""
    zeros = jnp.zeros_like(q)
    return rnea(robot, q, qd, qd, zeros, mass=mass, com=com, inertia=inertia,
                set_gravity=True, include_armature=False)
