"""Closed-loop tracking + safety oracle tests (S7): the robust CBF controller
must keep the plant inside the ultimate bound under worst-case model error,
and the receding-horizon trial must reach an easy goal with zero safety
violations (simulator_armtd.m acceptance semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.collision import pad_obstacles
from armour_tpu.planner import make_planner
from armour_tpu.simulator import (
    TrueParams, make_oracles, make_rollout, run_trial, sample_true_params,
)
from armour_tpu.trajectory import advance_plan, desired_state, initial_plan
from armour_tpu.worlds import World

ROBOT = kinova_gen3()
CFG = ArmourConfig(num_time_steps=32, dtype=jnp.float64, max_obstacles=8)

Q0 = np.array([0.0, -0.3, 0.0, -1.2, 0.0, -0.8, 0.0])


def worst_case_params():
    rng = np.random.default_rng(0)
    return sample_true_params(ROBOT, rng, scale=1.0)  # +3% everywhere


def test_tracking_within_ultimate_bound():
    """Track one feasible plan with +3% model error: |q - q_des| <= qe and
    |qd - qd_des| <= qde throughout (uarmtd_robust_CBF_LLC.m:192-228)."""
    rollout = make_rollout(ROBOT, CFG, control_dt=2e-3)
    tp = worst_case_params()
    ref = initial_plan(Q0, CFG.dtype)
    k = jnp.full(7, 0.5, CFG.dtype)
    ref = advance_plan(ref, k, jnp.asarray(Q0), jnp.zeros(7), jnp.zeros(7), CFG)
    q, qd, logs = rollout(jnp.asarray(Q0), jnp.zeros(7), ref, tp)
    pos_err = np.max(np.abs(np.asarray(logs["q"]) - np.asarray(logs["q_des"])))
    vel_err = np.max(np.abs(np.asarray(logs["qd"]) - np.asarray(logs["qd_des"])))
    assert pos_err <= CFG.ub.qe, pos_err
    assert vel_err <= CFG.ub.qde, vel_err


def test_braking_comes_to_rest():
    """After a feasible plan, an infeasible one must replay the braking tail
    and end at rest (uarmtd_planner.m:910-921)."""
    rollout = make_rollout(ROBOT, CFG, control_dt=2e-3)
    tp = worst_case_params()
    ref = initial_plan(Q0, CFG.dtype)
    k = jnp.full(7, 0.8, CFG.dtype)
    ref = advance_plan(ref, k, jnp.asarray(Q0), jnp.zeros(7), jnp.zeros(7), CFG)
    q, qd, logs = rollout(jnp.asarray(Q0), jnp.zeros(7), ref, tp)
    # now plan fails -> NaN; anchor at the reference state at t_plan
    q1, qd1, qdd1 = desired_state(ref, CFG.t_plan, CFG)
    ref = advance_plan(ref, jnp.full(7, jnp.nan), q1, qd1, qdd1, CFG)
    q, qd, logs = rollout(q, qd, ref, tp)
    assert float(jnp.linalg.norm(qd)) < 0.05, np.asarray(qd)
    # reference at end of braking equals previous plan's endpoint
    q_end, qd_end, _ = desired_state(ref, CFG.t_plan, CFG)
    np.testing.assert_allclose(np.asarray(qd_end), 0.0, atol=1e-9)


def test_direct_move_mode_executes_reference_exactly():
    """'direct' mode teleports the agent along the reference with zero input
    (uarmtd_agent.m:468-477) — the fast planner-only regression trick."""
    rollout = make_rollout(ROBOT, CFG, control_dt=5e-3, move_mode="direct")
    tp = worst_case_params()
    ref = initial_plan(Q0, CFG.dtype)
    k = jnp.full(7, 0.4, CFG.dtype)
    ref = advance_plan(ref, k, jnp.asarray(Q0), jnp.zeros(7), jnp.zeros(7), CFG)
    q, qd, logs = rollout(jnp.asarray(Q0), jnp.zeros(7), ref, tp)
    np.testing.assert_allclose(np.asarray(logs["q"]), np.asarray(logs["q_des"]))
    assert np.all(np.asarray(logs["u"]) == 0.0)
    q_ref, qd_ref, _ = desired_state(ref, CFG.t_plan, CFG)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-12)


def test_althoff_controller_tracks():
    """The Giusti-Althoff PI-adaptive comparison controller must track a
    feasible plan under +3% model error (robust_controller.cpp:112-128;
    comparison axis of kinova_compare_robust_controller.m)."""
    rollout = make_rollout(ROBOT, CFG, control_dt=2e-3, controller="althoff")
    tp = worst_case_params()
    ref = initial_plan(Q0, CFG.dtype)
    k = jnp.full(7, 0.5, CFG.dtype)
    ref = advance_plan(ref, k, jnp.asarray(Q0), jnp.zeros(7), jnp.zeros(7), CFG)
    q, qd, logs = rollout(jnp.asarray(Q0), jnp.zeros(7), ref, tp)
    pos_err = np.max(np.abs(np.asarray(logs["q"]) - np.asarray(logs["q_des"])))
    assert np.isfinite(pos_err) and pos_err < 0.05, pos_err


def test_measurement_noise_keeps_ultimate_bound():
    """1e-4 encoder-scale measurement noise (uarmtd_agent.m:300-312) must not
    break the robust controller's tracking bound."""
    rollout = make_rollout(ROBOT, CFG, control_dt=2e-3, measurement_noise=1e-4)
    tp = worst_case_params()
    ref = initial_plan(Q0, CFG.dtype)
    k = jnp.full(7, 0.5, CFG.dtype)
    ref = advance_plan(ref, k, jnp.asarray(Q0), jnp.zeros(7), jnp.zeros(7), CFG)
    q, qd, logs = rollout(jnp.asarray(Q0), jnp.zeros(7), ref, tp)
    pos_err = np.max(np.abs(np.asarray(logs["q"]) - np.asarray(logs["q_des"])))
    vel_err = np.max(np.abs(np.asarray(logs["qd"]) - np.asarray(logs["qd_des"])))
    assert pos_err <= CFG.ub.qe, pos_err
    assert vel_err <= CFG.ub.qde, vel_err


def test_ee_location_goal_mode():
    """kinova_world_static.m goal_type 'end_effector_location': the goal
    check is the workspace EE distance, not the config norm — a DIFFERENT
    configuration whose EE lands at the target must pass."""
    from armour_tpu.hlp import ee_position, ik_damped_ls
    from armour_tpu.worlds import World, world_goal_check

    robot = kinova_gen3()
    q_goal = np.array([0.3, -0.4, 0.2, -1.0, 0.1, -0.5, 0.0])
    target = ee_position(robot, q_goal)
    w = World(start=np.zeros(7), goal=q_goal,
              obstacle_centers=np.zeros((0, 3)),
              obstacle_generators=np.zeros((0, 3, 3)),
              goal_type="end_effector_location")
    assert world_goal_check(w, q_goal, robot)
    assert not world_goal_check(w, np.zeros(7), robot)
    # an IK solution from a different seed reaches the same EE target
    q_alt, ok = ik_damped_ls(robot, target, q_goal + 0.3)
    assert ok
    if np.linalg.norm(np.mod(q_alt - q_goal + np.pi, 2 * np.pi) - np.pi) > np.pi / 30:
        assert world_goal_check(w, q_alt, robot)
    # config mode rejects the alternative configuration
    w_cfg = World(start=np.zeros(7), goal=q_goal,
                  obstacle_centers=np.zeros((0, 3)),
                  obstacle_generators=np.zeros((0, 3, 3)))
    assert world_goal_check(w_cfg, q_goal, robot)


def test_oracle_detects_rotated_obstacle_collision():
    """A rotated box that overlaps a link only through its off-diagonal
    generators must be flagged (round-1 oracle used diag(|G|) and missed it)."""
    from armour_tpu.rnea_numeric import forward_kinematics

    oracles = make_oracles(ROBOT, CFG)
    q = jnp.asarray(Q0, CFG.dtype)
    _, _, centers = forward_kinematics(ROBOT, q)
    c_link = np.asarray(centers)[3]  # a mid-chain link center

    # thin slab rotated 45 deg about z, positioned so its ROTATED extent
    # covers the link but its axis-aligned diag(|G|) box would NOT reach it
    th = np.pi / 4
    R = np.array([[np.cos(th), -np.sin(th), 0.0],
                  [np.sin(th), np.cos(th), 0.0],
                  [0.0, 0.0, 1.0]])
    G = R @ np.diag([0.4, 0.01, 0.01])
    center = c_link + R @ np.array([0.35, 0.0, 0.0])  # along the long axis
    obs = pad_obstacles(center[None], G[None], CFG.max_obstacles, CFG.dtype)

    logs = {
        "q": q[None, :], "qd": jnp.zeros((1, 7), CFG.dtype),
        "u": jnp.zeros((1, 7), CFG.dtype),
        "q_des": q[None, :], "qd_des": jnp.zeros((1, 7), CFG.dtype),
    }
    checks = oracles(logs, obs)
    assert bool(checks["collision"]), "rotated-box overlap must be detected"

    # sanity: the same slab moved far away is not a collision
    obs_far = pad_obstacles((center + 5.0)[None], G[None], CFG.max_obstacles, CFG.dtype)
    checks_far = oracles(logs, obs_far)
    assert not bool(checks_far["collision"])


@pytest.mark.slow
def test_trial_reaches_easy_goal():
    world = World(
        start=Q0,
        goal=Q0 + 0.12,
        obstacle_centers=np.array([[0.7, 0.7, 0.4]]),
        obstacle_generators=np.diag([0.05, 0.05, 0.05])[None],
    )
    obs = pad_obstacles(
        world.obstacle_centers, world.obstacle_generators, CFG.max_obstacles, CFG.dtype
    )
    step = make_planner(ROBOT, CFG)
    summary = run_trial(
        world, ROBOT, CFG, step, obs, worst_case_params(), max_iterations=8
    )
    assert not summary.collision
    assert not summary.torque_exceeded
    assert not summary.ultimate_bound_exceeded
    assert not summary.joint_limit_exceeded
    assert summary.goal_reached, summary


@pytest.mark.slow
def test_world_suite_resume(tmp_path):
    """run_world_suite(resume=True) skips worlds already in the results file
    and reproduces identical summaries for the rest (checkpoint/resume for
    long sweeps)."""
    import glob
    import json

    from armour_tpu.experiments import run_world_suite, save_results

    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float64, num_time_steps=16, screen_k=256,
                       max_obstacles=8)
    d = tmp_path / "worlds"
    d.mkdir()
    rng = np.random.default_rng(0)
    from armour_tpu.worlds import World, save_world_csv
    for i in range(3):
        start = rng.uniform(-0.3, 0.3, 7)
        w = World(start=start, goal=start + 0.1,
                  obstacle_centers=np.array([[2.0, 2.0, 2.0]]),
                  obstacle_generators=np.stack([np.diag([0.05] * 3)]))
        save_world_csv(w, str(d / f"w_{i}.csv"))
    paths = sorted(glob.glob(str(d / "*.csv")))
    res_path = str(tmp_path / "res.json")

    full = run_world_suite(paths, robot, cfg, max_iterations=3, verbose=False,
                           results_path=res_path, use_hlp=False)
    # truncate the results file to the first world only, then resume
    with open(res_path) as f:
        payload = json.load(f)
    save_results(full[:1], res_path)
    resumed = run_world_suite(paths, robot, cfg, max_iterations=3,
                              verbose=False, results_path=res_path,
                              use_hlp=False, resume=True)
    assert [r.world for r in resumed] == [r.world for r in full]
    for a, b in zip(resumed, full):
        assert a.bucket() == b.bucket()
        assert a.summary.iterations == b.summary.iterations
