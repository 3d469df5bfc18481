"""Grasp/contact extension: contact-wrench PZ containment vs numeric contact
RNEA samples (VERDICT round-1 item 8; Dynamics_sav.cu:17-20,891-896)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from armour_tpu import bezier, rnea_numeric
from armour_tpu.config import ArmourConfig, UltimateBound
from armour_tpu.grasp import (ContactWrenchFRS, GraspParams,
                              contact_wrench_frs, grasp_constraint_intervals,
                              grasp_frs)
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
def jrs():
    return build_jrs(jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0),
                     ROBOT, CFG, BASIS)


@pytest.fixture(scope="module")
def wrench(jrs):
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


def test_grasp_frs_rows_sound(jrs):
    """The k-sliced planner rows g_coef.phi(k) + g_rad upper-bound every
    sampled numeric constraint value (same soundness as the interval bounds,
    but k-sliceable)."""
    params = GraspParams(mu=0.6, support_radius=0.06)
    rows = grasp_frs(jrs, ROBOT, CFG, BASIS, params)
    j = ROBOT.num_joints - 1
    a = params.normal_axis
    t_axes = [i for i in range(3) if i != a]
    rng = np.random.default_rng(15)
    for _ in range(20):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        _, f_true, n_true = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd),
            jnp.asarray(qdd), wrench_at=j)
        f_true, n_true = np.asarray(f_true), np.asarray(n_true)
        truth = np.array([
            -f_true[a],
            f_true[t_axes[0]] ** 2 + f_true[t_axes[1]] ** 2 - params.mu ** 2 * f_true[a] ** 2,
            n_true[t_axes[0]] ** 2 + n_true[t_axes[1]] ** 2 - params.support_radius ** 2 * f_true[a] ** 2,
        ])
        phi = np.asarray(BASIS.phi(jnp.asarray(k)))
        g = np.asarray(rows.g_coef[t_ind]) @ phi + np.asarray(rows.g_rad[t_ind])
        assert np.all(truth <= g + 1e-8), (t_ind, truth, g)


def test_grasp_rows_gate_the_planner():
    """Wired-in capability check (uarmtd_planner.m:539-542 intent): with
    permissive contact params the solver finds a feasible k whose grasp rows
    are satisfied; with a near-zero friction cone the same problem is
    rejected (NaN -> braking) even though it is feasible without grasp rows —
    i.e. the rejection comes from the contact constraints."""
    from armour_tpu.collision import pad_obstacles
    from armour_tpu.planner import make_planner

    from armour_tpu.config import derive_ultimate_bound

    q0 = jnp.asarray(np.linspace(-0.3, 0.3, F))
    qd0 = jnp.full((F,), 0.1)
    qdd0 = jnp.zeros((F,))
    q_des = q0 + 0.05
    obs = pad_obstacles(np.array([[2.0, 2.0, 2.0]]),
                        np.stack([np.diag([0.05] * 3)]), 8, jnp.float64)

    # controller tuning is a design knob: the reference's own dumbbell
    # example drops V_max from 1e-2 to 5e-5 (kinova_walking_lab_example.m:36)
    # because the payload arm's 9 N*m wrist budget cannot absorb the
    # default robust-input radius; we use 5e-4 (eps ~ 0.012 rad).
    base = dict(derive_ub=False,
                ub=derive_ultimate_bound(ROBOT, v_max=5e-4),
                num_time_steps=16, dtype=jnp.float64,
                max_obstacles=8, screen_k=256)
    cfg_off = ArmourConfig.for_robot(ROBOT, **base)
    cfg_ok = ArmourConfig.for_robot(ROBOT, grasp_constraints=True,
                                    grasp_mu=1.5, grasp_support_radius=0.5,
                                    **base)
    cfg_tight = ArmourConfig.for_robot(ROBOT, grasp_constraints=True,
                                       grasp_mu=1e-4,
                                       grasp_support_radius=1e-4, **base)

    res_off = make_planner(ROBOT, cfg_off)(q0, qd0, qdd0, q_des, obs)
    assert bool(res_off.feasible), "baseline (no grasp rows) must be feasible"

    res_ok = make_planner(ROBOT, cfg_ok)(q0, qd0, qdd0, q_des, obs)
    assert bool(res_ok.feasible), "permissive contact params must stay feasible"
    assert np.all(np.isfinite(np.asarray(res_ok.k)))

    res_tight = make_planner(ROBOT, cfg_tight)(q0, qd0, qdd0, q_des, obs)
    assert not bool(res_tight.feasible), (
        "a ~zero friction cone must reject every k (slip row unsatisfiable)")
    assert np.all(np.isnan(np.asarray(res_tight.k)))


@pytest.mark.slow
def test_grasp_closed_loop_tray_trial():
    """Closed-loop waiter's-tray trial: the dumbbell robot tracks a short
    goal with grasp constraints active; no safety oracle fires and the
    contact rows hold along the way."""
    from armour_tpu.collision import pad_obstacles
    from armour_tpu.planner import make_planner
    from armour_tpu.simulator import run_trial, sample_true_params
    from armour_tpu.worlds import World

    from armour_tpu.config import derive_ultimate_bound

    cfg = ArmourConfig.for_robot(ROBOT, derive_ub=False,
                                 ub=derive_ultimate_bound(ROBOT, v_max=5e-4),
                                 num_time_steps=16,
                                 dtype=jnp.float64, max_obstacles=8,
                                 screen_k=256, grasp_constraints=True,
                                 grasp_mu=1.5, grasp_support_radius=0.5)
    start = np.linspace(-0.3, 0.3, F)
    world = World(
        start=start, goal=start + 0.12,
        obstacle_centers=np.array([[2.0, 2.0, 2.0]]),
        obstacle_generators=np.stack([np.diag([0.05] * 3)]),
    )
    obs = pad_obstacles(world.obstacle_centers, world.obstacle_generators,
                        cfg.max_obstacles, cfg.dtype)
    tp = sample_true_params(ROBOT, np.random.default_rng(0), scale=1.0)
    step = make_planner(ROBOT, cfg)
    summary = run_trial(world, ROBOT, cfg, step, obs, tp, max_iterations=8)
    assert not summary.collision
    assert not summary.torque_exceeded
    assert not summary.ultimate_bound_exceeded
    assert not summary.joint_limit_exceeded
    assert summary.goal_reached, summary
