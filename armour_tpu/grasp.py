"""Grasp / contact extension: end-effector contact wrench PZs and the
waiter's-tray contact constraints.

TPU-native equivalent of the reference's Dynamics_sav.cu work-in-progress
(f_c_{nom,int} / n_c_{nom,int} contact force/moment PZs at the end effector,
Dynamics_sav.cu:17-20,891-896; the `grasp_constraints_flag` placeholder in
uarmtd_planner.m:539-542 never materialized).  Here the wrench PZs come from
the shared PZ-RNEA backward recursion (dynamics.rnea_pz_sets(wrench_at=j)),
and the three classical frictional-contact conditions are provided as
k-sliceable constraint rows:

  separation:  -f_n <= 0                 (contact force pushes, never pulls)
  slipping:    ||f_t||^2 - mu^2 f_n^2 <= 0
  tipping:     ||n_t||^2 - r^2  f_n^2 <= 0  (moment arm within support disc)

with f decomposed along the contact normal in the payload frame.  All three
are polynomial in the wrench components, so their PZ interval bounds give
sound constraints over the whole (k, error) set; the NLP-facing evaluation
slices them at k like every other row.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .config import ArmourConfig
from .dynamics import rnea_pz_sets
from .jrs import JRS
from .pz import bpz
from .pz.basis import KBasis
from .pz.bpz import BPZ
from .robot import RobotModel


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ContactWrenchFRS:
    """Contact wrench PZs at the grasp joint, nominal + interval params."""

    f_nom: BPZ  # [T, 3]
    n_nom: BPZ  # [T, 3]
    f_int: BPZ  # [T, 3]
    n_int: BPZ  # [T, 3]


def contact_wrench_frs(jrs: JRS, robot: RobotModel, cfg: ArmourConfig,
                       basis: KBasis, contact_joint: int | None = None) -> ContactWrenchFRS:
    """Wrench transmitted to the payload body (defaults to the last chain
    link) for nominal and interval inertial parameters
    (Dynamics_sav.cu f_c/n_c)."""
    j = robot.num_joints - 1 if contact_joint is None else contact_joint
    _, f_c, n_c = rnea_pz_sets(jrs, robot, cfg, basis, sets=("nom", "int"),
                               wrench_at=j)
    pick = lambda p, i: BPZ(coef=p.coef[i], egen=p.egen[i], rad=p.rad[i])
    return ContactWrenchFRS(
        f_nom=pick(f_c, 0), n_nom=pick(n_c, 0),
        f_int=pick(f_c, 1), n_int=pick(n_c, 1),
    )


@dataclasses.dataclass(frozen=True)
class GraspParams:
    """Contact model: friction coefficient and support-disc radius
    (waiter's-tray conditions)."""

    mu: float = 0.5
    support_radius: float = 0.05
    normal_axis: int = 2  # contact normal in the payload frame


def grasp_constraint_intervals(w: ContactWrenchFRS, params: GraspParams,
                               basis: KBasis, cfg: ArmourConfig):
    """Sound interval bounds of the three contact constraints over the whole
    (k, error) set, from the INTERVAL wrench PZs: returns per-time upper
    bounds (g <= 0 safe).  Polynomials of PZs evaluated in PZ arithmetic keep
    the containment guarantee."""
    a = params.normal_axis
    t_axes = [i for i in range(3) if i != a]
    slop = cfg.float_slop

    def comp(p: BPZ, i: int) -> BPZ:
        return BPZ(coef=p.coef[..., i, :], egen=p.egen[..., i, :], rad=p.rad[..., i])

    f_n = comp(w.f_int, a)
    f_t = [comp(w.f_int, i) for i in t_axes]
    n_t = [comp(w.n_int, i) for i in t_axes]

    # separation: -f_n <= 0  -> upper bound of -f_n
    c_sep, r_sep = bpz.to_interval(bpz.neg(f_n))
    g_sep = c_sep + r_sep

    # slipping: f_tx^2 + f_ty^2 - mu^2 f_n^2 <= 0
    sq = lambda p: bpz.mul(p, p, basis, slop)
    slip = bpz.add(sq(f_t[0]), sq(f_t[1]))
    slip = bpz.add(slip, bpz.scale(sq(f_n), -params.mu ** 2))
    c_slip, r_slip = bpz.to_interval(slip)
    g_slip = c_slip + r_slip

    # tipping: n_tx^2 + n_ty^2 - r^2 f_n^2 <= 0
    tip = bpz.add(sq(n_t[0]), sq(n_t[1]))
    tip = bpz.add(tip, bpz.scale(sq(f_n), -params.support_radius ** 2))
    c_tip, r_tip = bpz.to_interval(tip)
    g_tip = c_tip + r_tip

    return g_sep, g_slip, g_tip
