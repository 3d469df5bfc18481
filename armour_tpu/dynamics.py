"""PZ recursive Newton-Euler (passivity form) and the robust torque bound.

TPU-native equivalent of KinematicsDynamics::rnea (Dynamics.cu:83-181): the
forward recursion propagates angular velocity w, auxiliary velocity w_aux,
acceleration wdot and linear acceleration through the chain in BPZ tensors
batched over all time steps; the backward recursion accumulates wrenches and
reads off the joint torque along the motion axis, plus armature and damping
terms.  Called twice — nominal and interval inertial parameters — to obtain
the disturbance PZ, from which the robust-input bound and total control input
radius are assembled exactly as in armour_main.cu:171-210.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .config import ArmourConfig
from .jrs import JRS
from .pz import bpz
from .pz.basis import KBasis
from .pz.bpz import BPZ
from .robot import RobotModel


def _joint_pz(arr: BPZ, i: int) -> BPZ:
    return BPZ(coef=arr.coef[:, i], egen=arr.egen[:, i], rad=arr.rad[:, i])


def _inertial_pzs(robot: RobotModel, basis: KBasis, dtype, uncertain: bool):
    """Mass and inertia PZs (Dynamics.cu:30-41)."""
    mass = jnp.asarray(robot.mass, dtype)
    inertia = jnp.asarray(robot.inertia, dtype)
    mrad = robot.mass_uncertainty * jnp.abs(mass) if uncertain else jnp.zeros_like(mass)
    irad = (
        robot.inertia_uncertainty * jnp.abs(inertia)
        if uncertain
        else jnp.zeros_like(inertia)
    )
    mass_pz = bpz.from_interval(mass, mrad, basis)          # [J]
    inertia_pz = bpz.from_interval(inertia, irad, basis)    # [J, 3, 3]
    return mass_pz, inertia_pz


def rnea_pz(jrs: JRS, robot: RobotModel, cfg: ArmourConfig, basis: KBasis,
            uncertain: bool, set_gravity: bool = True) -> BPZ:
    """PZ RNEA torque u [T, F] (Dynamics.cu:83-181)."""
    dt = cfg.dtype
    T = cfg.num_time_steps
    J = robot.num_joints
    slop = cfg.float_slop
    trans = jnp.asarray(robot.trans, dt)
    com = jnp.asarray(robot.com, dt)
    mass_pz, inertia_pz = _inertial_pzs(robot, basis, dt, uncertain)

    w = bpz.zeros((T, 3), basis, dt)
    w_aux = bpz.zeros((T, 3), basis, dt)
    wdot = bpz.zeros((T, 3), basis, dt)
    lin_acc = bpz.zeros((T, 3), basis, dt)
    if set_gravity:
        lin_acc = BPZ(
            coef=lin_acc.coef.at[:, 2, 0].set(robot.gravity),
            egen=lin_acc.egen,
            rad=lin_acc.rad,
        )

    F_list, N_list = [], []
    for i in range(J):
        rt_i = BPZ(coef=jrs.Rt.coef[:, i], egen=jrs.Rt.egen[:, i], rad=jrs.Rt.rad[:, i])
        axis = int(robot.axes[i])

        # line 16: linear acceleration transported to frame i
        acc_arg = bpz.add(
            lin_acc,
            bpz.add(
                bpz.cross_pz_const(wdot, trans[i]),
                bpz.cross(w, bpz.cross_pz_const(w_aux, trans[i]), basis, slop),
            ),
        )
        lin_acc = bpz.matvec(rt_i, acc_arg, basis, slop)

        # lines 13-15: rotate w / w_aux / wdot into frame i
        w = bpz.matvec(rt_i, w, basis, slop)
        w_aux = bpz.matvec(rt_i, w_aux, basis, slop)
        wdot = bpz.matvec(rt_i, wdot, basis, slop)

        if axis != 0 and i < robot.num_factors:
            ax = abs(axis) - 1
            qd_i = bpz.axis_embed(_joint_pz(jrs.qd, i), ax)
            w = bpz.add(w, qd_i)
            wdot = bpz.add(wdot, bpz.cross(w_aux, qd_i, basis, slop))
            wdot = bpz.add(wdot, bpz.axis_embed(_joint_pz(jrs.qdda, i), ax))
            w_aux = bpz.add(w_aux, bpz.axis_embed(_joint_pz(jrs.qda, i), ax))

        # lines 23 & 27: link force at COM
        f_arg = bpz.add(
            lin_acc,
            bpz.add(
                bpz.cross_pz_const(wdot, com[i]),
                bpz.cross(w, bpz.cross_pz_const(w_aux, com[i]), basis, slop),
            ),
        )
        m_i = BPZ(
            coef=mass_pz.coef[i][None, None, :],
            egen=mass_pz.egen[i][None, None, :],
            rad=mass_pz.rad[i][None, None],
        )
        F_list.append(bpz.mul(m_i, f_arg, basis, slop))

        # line 29: link moment
        I_i = BPZ(
            coef=inertia_pz.coef[i][None],
            egen=inertia_pz.egen[i][None],
            rad=inertia_pz.rad[i][None],
        )
        N_list.append(
            bpz.add(
                bpz.matvec(I_i, wdot, basis, slop),
                bpz.cross(w_aux, bpz.matvec(I_i, w, basis, slop), basis, slop),
            )
        )

    # backward recursion (Dynamics.cu:160-181)
    f = bpz.zeros((T, 3), basis, dt)
    n = bpz.zeros((T, 3), basis, dt)
    torques = [None] * robot.num_factors
    for i in reversed(range(J)):
        r_ip1 = BPZ(
            coef=jrs.R.coef[:, i + 1], egen=jrs.R.egen[:, i + 1], rad=jrs.R.rad[:, i + 1]
        )
        rf = bpz.matvec(r_ip1, f, basis, slop)
        n = bpz.add(
            bpz.add(_vec(N_list[i]), bpz.matvec(r_ip1, n, basis, slop)),
            bpz.add(
                bpz.cross_const(com[i], _vec(F_list[i])),
                bpz.cross_const(trans[i + 1], rf),
            ),
        )
        f = bpz.add(rf, _vec(F_list[i]))

        axis = int(robot.axes[i])
        if axis != 0 and i < robot.num_factors:
            ax = abs(axis) - 1
            u_i = BPZ(coef=n.coef[:, ax], egen=n.egen[:, ax], rad=n.rad[:, ax])
            u_i = bpz.add(u_i, bpz.scale(_joint_pz(jrs.qdda, i), robot.armature[i]))
            if robot.damping[i] != 0.0:
                u_i = bpz.add(u_i, bpz.scale(_joint_pz(jrs.qd, i), robot.damping[i]))
            torques[i] = u_i

    return BPZ(
        coef=jnp.stack([t.coef for t in torques], axis=1),
        egen=jnp.stack([t.egen for t in torques], axis=1),
        rad=jnp.stack([t.rad for t in torques], axis=1),
    )


def _vec(x: BPZ) -> BPZ:
    return x


@dataclasses.dataclass
class TorqueFRS:
    """Reduced nominal torque + total control-input radius for the NLP."""

    u_coef: jnp.ndarray         # [T, F, B] sliceable nominal torque k-poly
    torque_radius: jnp.ndarray  # [T, F] total input PZ radius (robust bound
                                # + nominal radius + friction)


jax.tree_util.register_dataclass(
    TorqueFRS, data_fields=["u_coef", "torque_radius"], meta_fields=[]
)


def torque_frs(jrs: JRS, robot: RobotModel, cfg: ArmourConfig, basis: KBasis) -> TorqueFRS:
    """Nominal torque PZ + robust input radius (armour_main.cu:128-210)."""
    u_nom = rnea_pz(jrs, robot, cfg, basis, uncertain=False)
    u_int = rnea_pz(jrs, robot, cfg, basis, uncertain=True)
    disturbance = bpz.sub(u_int, u_nom)

    # interval hull of the disturbance per (T, F)
    d_c, d_r = bpz.to_interval(disturbance)
    d_lo, d_hi = d_c - d_r, d_c + d_r
    d_max = jnp.maximum(jnp.abs(d_lo), jnp.abs(d_hi))

    ub = cfg.ub
    # rho_max = || sqrt(sum_i max(|interval_i|)^2) || upper bound:
    # interval square upper = max(lo^2, hi^2) summed then sqrt
    # (armour_main.cu:175-190 uses interval arithmetic; the upper bound is
    # exactly sqrt(sum max(lo^2, hi^2)))
    rho_sq = jnp.sum(jnp.maximum(d_lo * d_lo, d_hi * d_hi), axis=1)  # [T]
    rho_max = jnp.sqrt(rho_sq)

    u_nom_red = bpz.reduce_(u_nom)

    torque_radius = (
        ub.alpha * (ub.m_max - ub.m_min) * ub.eps
        + 0.5 * d_max
        + 0.5 * rho_max[:, None]
        + u_nom_red.rad
        + jnp.asarray(robot.friction, cfg.dtype)[None, :]
    )
    return TorqueFRS(u_coef=u_nom_red.coef, torque_radius=torque_radius)
