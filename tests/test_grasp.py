"""Grasp/contact extension: contact-wrench PZ containment vs numeric contact
RNEA samples (VERDICT round-1 item 8; Dynamics_sav.cu:17-20,891-896)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from armour_tpu import bezier, rnea_numeric
from armour_tpu.config import ArmourConfig
from armour_tpu.grasp import (ContactWrenchFRS, GraspParams,
                              contact_wrench_frs, grasp_constraint_intervals)
from armour_tpu.jrs import build_jrs
from armour_tpu.models import zoo
from armour_tpu.pz import basis as basis_mod
from armour_tpu.pz import bpz

ROBOT = zoo.load_zoo_robot("kinova_dumbbell")  # grasped-payload flagship
CFG = ArmourConfig.for_robot(ROBOT, derive_ub=False, num_time_steps=8,
                             dtype=jnp.float64)
BASIS = basis_mod.make_basis(ROBOT.num_factors, CFG.max_poly_degree)

F = ROBOT.num_factors
Q0 = np.linspace(-0.4, 0.4, F)
QD0 = np.full(F, 0.1)
QDD0 = np.zeros(F)


@pytest.fixture(scope="module")
def wrench():
    jrs = build_jrs(jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0),
                    ROBOT, CFG, BASIS)
    return contact_wrench_frs(jrs, ROBOT, CFG, BASIS)


def _sample_traj(rng, t_ind):
    ds = 1.0 / CFG.num_time_steps
    s = rng.uniform(t_ind * ds, (t_ind + 1) * ds)
    k = rng.uniform(-1, 1, F)
    k_act = k * np.asarray(CFG.k_range)
    Tqd0 = QD0 * CFG.duration
    TTqdd0 = QDD0 * CFG.duration**2
    q = np.asarray(bezier.q_des(Q0, Tqd0, TTqdd0, k_act, s))
    qd = np.asarray(bezier.qd_des(Q0, Tqd0, TTqdd0, k_act, s)) / CFG.duration
    qdd = np.asarray(bezier.qdd_des(Q0, Tqd0, TTqdd0, k_act, s)) / CFG.duration**2
    return q, qd, qdd, k


def test_contact_wrench_containment_nominal(wrench):
    """Numeric contact wrench at the payload body lies inside the sliced
    nominal wrench PZ band."""
    j = ROBOT.num_joints - 1
    rng = np.random.default_rng(12)
    for _ in range(30):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        _, f_true, n_true = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd),
            jnp.asarray(qdd), wrench_at=j)
        phi = BASIS.phi(jnp.asarray(k))
        for pz_all, truth in ((wrench.f_nom, np.asarray(f_true)),
                              (wrench.n_nom, np.asarray(n_true))):
            pz = bpz.BPZ(pz_all.coef[t_ind], pz_all.egen[t_ind], pz_all.rad[t_ind])
            c, r = bpz.slice_at(pz, phi)
            assert np.all(np.abs(truth - np.asarray(c)) <= np.asarray(r) + 1e-10), (
                t_ind, truth, np.asarray(c), np.asarray(r))


def test_contact_wrench_containment_interval(wrench):
    """Interval wrench PZ covers perturbed-parameter contact wrenches."""
    j = ROBOT.num_joints - 1
    rng = np.random.default_rng(13)
    for _ in range(15):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        dm = 1.0 + rng.uniform(-1, 1, ROBOT.num_joints) * ROBOT.mass_uncertainty
        dI = (1.0 + rng.uniform(-1, 1, (ROBOT.num_joints, 1, 1))
              * ROBOT.inertia_uncertainty)
        _, f_true, n_true = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd),
            jnp.asarray(qdd), mass=ROBOT.mass * dm, inertia=ROBOT.inertia * dI,
            wrench_at=j)
        phi = BASIS.phi(jnp.asarray(k))
        for pz_all, truth in ((wrench.f_int, np.asarray(f_true)),
                              (wrench.n_int, np.asarray(n_true))):
            pz = bpz.BPZ(pz_all.coef[t_ind], pz_all.egen[t_ind], pz_all.rad[t_ind])
            c, r = bpz.slice_at(pz, phi)
            assert np.all(np.abs(truth - np.asarray(c)) <= np.asarray(r) + 1e-10)


def test_grasp_constraint_intervals_are_sound(wrench):
    """The interval constraint bounds must upper-bound every sampled numeric
    constraint value (separation / slipping / tipping)."""
    params = GraspParams(mu=0.6, support_radius=0.06)
    g_sep, g_slip, g_tip = grasp_constraint_intervals(wrench, params, BASIS, CFG)
    j = ROBOT.num_joints - 1
    a = params.normal_axis
    t_axes = [i for i in range(3) if i != a]
    rng = np.random.default_rng(14)
    for _ in range(20):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        _, f_true, n_true = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd),
            jnp.asarray(qdd), wrench_at=j)
        f_true, n_true = np.asarray(f_true), np.asarray(n_true)
        sep = -f_true[a]
        slip = f_true[t_axes[0]] ** 2 + f_true[t_axes[1]] ** 2 - params.mu ** 2 * f_true[a] ** 2
        tip = n_true[t_axes[0]] ** 2 + n_true[t_axes[1]] ** 2 - params.support_radius ** 2 * f_true[a] ** 2
        assert sep <= float(g_sep[t_ind]) + 1e-10
        assert slip <= float(g_slip[t_ind]) + 1e-8
        assert tip <= float(g_tip[t_ind]) + 1e-8
