"""End-to-end single planning iteration (S6 slice): solver quality and
ground-truth safety of the chosen trajectory parameter."""

import numpy as np
import jax.numpy as jnp
import pytest

from armour_tpu import bezier, nlp, rnea_numeric
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner
from armour_tpu.pz.basis import make_basis

ROBOT = kinova_gen3()
CFG = ArmourConfig(num_time_steps=32, dtype=jnp.float64, max_obstacles=8)
BASIS = make_basis(7, 3)

Q0 = np.array([0.6543, -0.0876, -0.4837, -1.2278, -1.5735, -1.0720, 0.0])
QD0 = np.zeros(7)
QDD0 = np.zeros(7)
# waypoint a modest distance away (straight-line HLP style)
Q_DES = Q0 + 0.04

# two obstacles well clear of the arm plus one closer (from the reference's
# example scene layout in armour_main.cu comments, scaled)
OBS_C = np.array([[0.5, 0.5, 0.5], [-0.5, -0.5, 0.8]])
OBS_G = np.stack([np.diag([0.05, 0.05, 0.05]), np.diag([0.08, 0.08, 0.08])])


@pytest.fixture(scope="module")
def result():
    step = make_planner(ROBOT, CFG)
    obs = pad_obstacles(OBS_C, OBS_G, CFG.max_obstacles, CFG.dtype)
    return step(
        jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0), jnp.asarray(Q_DES), obs
    )


def test_solver_finds_feasible(result):
    assert bool(result.feasible)
    assert np.all(np.isfinite(np.asarray(result.k)))
    assert np.all(np.abs(np.asarray(result.k)) <= 1.0 + 1e-9)


def test_solver_improves_cost(result):
    from armour_tpu.jrs import TrajectoryCoeffs

    traj = TrajectoryCoeffs(
        q0=jnp.asarray(Q0), qd0=jnp.asarray(QD0), qdd0=jnp.asarray(QDD0),
        Tqd0=jnp.asarray(QD0 * CFG.duration),
        TTqdd0=jnp.asarray(QDD0 * CFG.duration**2),
        k_scale=jnp.asarray(CFG.k_range), family="bernstein",
    )
    c_opt = nlp.plan_cost(jnp.asarray(result.k), traj, jnp.asarray(Q_DES), ROBOT, CFG)
    c_zero = nlp.plan_cost(jnp.zeros(7), traj, jnp.asarray(Q_DES), ROBOT, CFG)
    assert float(c_opt) < float(c_zero)


def test_chosen_trajectory_is_safe(result):
    """Ground-truth oracle: along the chosen trajectory, the arm link boxes
    stay clear of the obstacles and torques stay within limits (the
    simulator_armtd.m:238-267 runtime checks, planner-level)."""
    k = np.asarray(result.k)
    k_act = k * np.asarray(CFG.k_range)
    Tqd0 = QD0 * CFG.duration
    TTqdd0 = QDD0 * CFG.duration**2
    for s in np.linspace(0, 1, 101):
        q = np.asarray(bezier.q_des(Q0, Tqd0, TTqdd0, k_act, s))
        qd = np.asarray(bezier.qd_des(Q0, Tqd0, TTqdd0, k_act, s)) / CFG.duration
        qdd = np.asarray(bezier.qdd_des(Q0, Tqd0, TTqdd0, k_act, s)) / CFG.duration**2
        R_w, p_w, centers = rnea_numeric.forward_kinematics(ROBOT, jnp.asarray(q))
        # conservative sphere check: link box circumradius vs obstacle box
        for i in range(7):
            r_link = float(np.linalg.norm(ROBOT.link_generators[i]))
            for c, g in zip(OBS_C, OBS_G):
                half = np.diag(g)
                d = np.abs(np.asarray(centers[i]) - c) - half
                dist = np.linalg.norm(np.maximum(d, 0.0))
                assert dist > -1e-9 or dist > r_link, (s, i)
        tau = np.asarray(
            rnea_numeric.rnea(ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd), jnp.asarray(qdd))
        )
        assert np.all(np.abs(tau) <= ROBOT.torque_limits), (s, tau)
        assert np.all(np.abs(qd) <= ROBOT.speed_limits + 1e-9)


def test_infeasible_returns_nan():
    """A wall of obstacles surrounding the arm must yield NaN (braking)."""
    # boxes tightly surrounding the arm workspace near the home position
    centers = []
    gens = []
    _, _, link_c = rnea_numeric.forward_kinematics(ROBOT, jnp.asarray(Q0))
    for i in range(7):
        centers.append(np.asarray(link_c[i]))
        gens.append(np.diag([0.3, 0.3, 0.3]))
    obs = pad_obstacles(np.asarray(centers)[:8], np.asarray(gens)[:8], CFG.max_obstacles, CFG.dtype)
    step = make_planner(ROBOT, CFG)
    res = step(jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0), jnp.asarray(Q_DES), obs)
    assert not bool(res.feasible)
    assert np.all(np.isnan(np.asarray(res.k)))


def test_boundary_optimum_not_locked_to_seed():
    """Regression: when the cost optimum sits ON a state-limit boundary the
    ALM approaches it from the infeasible side and terminates epsilon
    outside; the solver must pull the iterate back INTO the feasible set
    (bisection toward the best feasible seed) instead of returning the k=0
    seed — the k=0 fallback froze closed-loop trials in place forever
    (observed on the 100-world suite, round 3)."""
    import numpy as np

    from armour_tpu import nlp
    from armour_tpu.collision import (build_hyperplanes, pad_obstacles,
                                      screen_collision)
    from armour_tpu.dynamics import torque_frs
    from armour_tpu.jrs import build_jrs
    from armour_tpu.kinematics import forward_occupancy, reduce_links
    from armour_tpu.models.kinova import kinova_gen3
    from armour_tpu.pz.basis import make_basis

    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float64, num_time_steps=32, screen_k=512,
                       max_obstacles=8)
    basis = make_basis(7, 3)
    obs = pad_obstacles(np.array([[2.0, 2.0, 2.0]]),
                        np.stack([np.diag([0.05] * 3)]), 8, jnp.float64)
    # joint 1 sits 0.02 rad below its shrunk position limit; the waypoint
    # asks for +0.3 -> the optimum k rides the position-extremum boundary
    q0v = np.zeros(7)
    q0v[1] = robot.position_limits_ub[1] - cfg.ub.qe - 0.02
    q0 = jnp.asarray(q0v)
    z = jnp.zeros((7,), jnp.float64)
    wp = q0.at[1].add(0.3)

    jrs = build_jrs(q0, z, z, robot, cfg, basis)
    frs = reduce_links(forward_occupancy(jrs, robot, cfg, basis), basis)
    tq = torque_frs(jrs, robot, cfg, basis)
    hyp = build_hyperplanes(frs, obs)
    sc = screen_collision(hyp, obs, frs, cfg.screen_k)
    prob = nlp.PlanProblem(traj=jrs.traj, q_des=wp, torque=tq, frs=frs,
                           hyp=hyp, obs=obs, screened=sc)
    res = nlp.solve(prob, robot, cfg, basis)
    k = np.asarray(res.k)
    cost_k0 = float(nlp.plan_cost(z, prob.traj, wp, robot, cfg))

    assert bool(res.feasible)
    # must make real progress toward the limit, not return the k=0 seed
    assert k[1] > 0.15, k
    assert float(res.cost) < cost_k0 - 1e-3
    # and the returned plan must satisfy the TRUE limits
    vt, vc, vs, vg = nlp.max_violations(jnp.asarray(k), prob, robot, cfg, basis)
    assert float(vs) <= 1e-6


def test_smooth_obstacle_mode_sound_and_solves():
    """Smooth ablation (uarmtd_planner.m:711-731 duality variant as a
    shifted softmax): the smoothed constraint must over-approximate the
    exact one (g_smooth >= g_exact, conservative) and the planner must
    still find a feasible plan on the example scene."""
    import dataclasses

    import jax

    from armour_tpu.collision import (build_hyperplanes, eval_link_polys,
                                      screen_collision, screened_constraints)
    from armour_tpu.jrs import build_jrs
    from armour_tpu.kinematics import forward_occupancy, reduce_links

    obs = pad_obstacles(OBS_C, OBS_G, CFG.max_obstacles, CFG.dtype)
    jrs = build_jrs(jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0),
                    ROBOT, CFG, BASIS)
    frs = reduce_links(forward_occupancy(jrs, ROBOT, CFG, BASIS), BASIS)
    hyp = build_hyperplanes(frs, obs)
    sc = screen_collision(hyp, obs, frs, CFG.screen_k)
    k = jnp.asarray(np.full(7, 0.3), CFG.dtype)
    p_all = eval_link_polys(frs, BASIS.phi(k))
    g_exact, _ = screened_constraints(sc, p_all)
    g_smooth, _ = screened_constraints(sc, p_all, smooth_tau=0.01)
    real = np.asarray(sc.mask)
    assert np.all(np.asarray(g_smooth)[real] >= np.asarray(g_exact)[real] - 1e-12)
    # and not grossly loose: within tau*log(2C) of exact
    gap = np.asarray(g_smooth)[real] - np.asarray(g_exact)[real]
    assert gap.max() <= 0.01 * np.log(2 * 36) + 1e-9

    cfg_s = dataclasses.replace(CFG, smooth_obstacle_constraints=True)
    step = make_planner(ROBOT, cfg_s)
    res = step(jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0),
               jnp.asarray(Q_DES), obs)
    assert bool(res.feasible)
    assert np.all(np.isfinite(np.asarray(res.k)))


def test_infeasible_trial_attribution_and_retreat(tmp_path):
    """Driver semantics under permanent infeasibility (stubbed planner that
    always reports a collision-blocked problem): the trial must stop after
    stop_threshold consecutive failures, attribute every failed plan to the
    collision group, switch waypoints to the retreat target, and keep every
    safety oracle quiet (the braking reference holds the arm at rest)."""
    from armour_tpu.nlp import SolveResult
    from armour_tpu.simulator import run_trial, sample_true_params
    from armour_tpu.worlds import World

    def stub_step(q0, qd0, qdd0, q_des, obs):
        nan = jnp.full((7,), jnp.nan, CFG.dtype)
        return SolveResult(
            k=nan, feasible=jnp.asarray(False),
            cost=jnp.asarray(jnp.inf, CFG.dtype),
            viol=jnp.asarray([0.0, 0.5, 0.0, 0.0], CFG.dtype),
        )

    w = World(start=Q0, goal=Q0 + 1.0,
              obstacle_centers=np.array([[2.0, 2.0, 2.0]]),
              obstacle_generators=np.diag([0.05] * 3)[None])
    obs = pad_obstacles(w.obstacle_centers, w.obstacle_generators,
                        CFG.max_obstacles, CFG.dtype)
    tp = sample_true_params(ROBOT, np.random.default_rng(0), scale=1.0)
    trace = str(tmp_path / "trace.npz")
    s = run_trial(w, ROBOT, CFG, stub_step, obs, tp, max_iterations=8,
                  trace_path=trace)
    assert s.stuck
    assert s.infeasible_plans == 4          # stop_threshold
    assert s.blocked_counts == {"collision": 4}
    assert not (s.collision or s.torque_exceeded
                or s.ultimate_bound_exceeded or s.joint_limit_exceeded)
    # retreat: after the first failure every waypoint is the last feasible
    # plan-start state (= the start, since no plan ever succeeded)
    rec = np.load(trace)
    wps = rec["waypoint"][1:]
    np.testing.assert_allclose(
        wps, np.broadcast_to(np.asarray(Q0), wps.shape), atol=1e-6)


def test_realtime_planner_calibration():
    """make_realtime_planner derives the solver budget from the measured
    reachset time (armour_main.cu:227-229) and returns a step whose
    calibration reports a positive budget and a working solve."""
    from armour_tpu.planner import make_realtime_planner

    step, cal = make_realtime_planner(ROBOT, CFG)
    assert cal["budget_s"] > 0
    assert cal["outer_iters"] >= 2
    obs = pad_obstacles(OBS_C, OBS_G, CFG.max_obstacles, CFG.dtype)
    res = step(jnp.asarray(Q0), jnp.asarray(QD0), jnp.asarray(QDD0),
               jnp.asarray(Q_DES), obs)
    assert bool(res.feasible)


def test_screen_obstacle_quota_covers_every_obstacle():
    """With screen_obstacle_quota > 0 every REAL obstacle owns at least
    `quota` screened rows (the global top-K can starve far obstacles in
    clutter), the quota and fill parts never duplicate a row, and the
    padded obstacles' quota rows arrive mask-inert."""
    import numpy as np

    from armour_tpu.collision import (build_hyperplanes, pad_obstacles,
                                      screen_collision)
    from armour_tpu.jrs import build_jrs
    from armour_tpu.kinematics import forward_occupancy, reduce_links
    from armour_tpu.models.kinova import kinova_gen3
    from armour_tpu.pz.basis import make_basis

    robot = kinova_gen3()
    cfg = ArmourConfig(num_time_steps=16, dtype=jnp.float64, max_obstacles=8,
                       screen_k=256)
    basis = make_basis(7, cfg.max_poly_degree)
    rng = np.random.default_rng(0)
    # one obstacle close (dominates the global ranking), two far
    centers = np.array([[0.45, 0.2, 0.4], [1.9, 1.9, 1.9], [-1.8, 1.7, 1.5]])
    obs = pad_obstacles(centers, np.stack([np.diag([0.08] * 3)] * 3),
                        cfg.max_obstacles, cfg.dtype)
    q0 = jnp.zeros(7, jnp.float64)
    jrs = build_jrs(q0, q0, q0, robot, cfg, basis)
    frs = reduce_links(forward_occupancy(jrs, robot, cfg, basis), basis)
    hyp = build_hyperplanes(frs, obs)

    quota = 8
    sc = screen_collision(hyp, obs, frs, K=cfg.screen_k,
                          obstacle_quota=quota)
    T, J, O = hyp.dims
    # reconstruct (cell, obstacle) of every selected row: row = idx // O
    # doesn't carry the obstacle, so re-derive from the quota layout: the
    # first O*quota entries are per-obstacle by construction
    o_of_quota = np.tile(np.arange(O)[:, None], (1, quota)).reshape(-1)
    assert sc.row.shape[0] == cfg.screen_k
    for o in range(3):          # every real obstacle owns its quota rows
        owned = np.sum(o_of_quota == o)
        assert owned == quota
        assert np.all(np.asarray(sc.mask)[: O * quota][o_of_quota == o])
    # padded obstacles' quota rows are inert
    for o in range(3, O):
        assert not np.any(np.asarray(sc.mask)[: O * quota][o_of_quota == o])
    # no duplicate SELECTED INDEX between the quota block and the global
    # fill (a duplicated row double-counts its penalty in the ALM): a
    # duplicate would have an identical (cell row, full-precision d/delta
    # column) signature — distinct (t, j, o) rows differ in at least one
    d_np, delta_np = np.asarray(sc.d), np.asarray(sc.delta)
    keys = [(int(np.asarray(sc.row)[i]), d_np[:, i].tobytes(),
             delta_np[:, i].tobytes())
            for i in range(sc.row.shape[0]) if np.asarray(sc.mask)[i]]
    assert len(keys) == len(set(keys)), "duplicate screened rows"
