"""High-level planner layer: straight-line and workspace RRT* waypoints."""

import numpy as np
import pytest

from armour_tpu.hlp import (ConfigRRTStarHLP, EndEffectorRRTStarHLP,
                            StraightLineHLP, ee_position, ik_damped_ls)
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.worlds import World


@pytest.fixture(scope="module")
def robot():
    return kinova_gen3()


def _world(robot, obs_c, obs_g, start=None, goal=None):
    return World(
        start=np.zeros(7) if start is None else start,
        goal=np.full(7, 0.5) if goal is None else goal,
        obstacle_centers=np.asarray(obs_c).reshape(-1, 3),
        obstacle_generators=np.asarray(obs_g).reshape(-1, 3, 3),
    )


def test_ik_reaches_reachable_target(robot):
    rng = np.random.default_rng(0)
    q_true = rng.uniform(-0.8, 0.8, 7)
    target = ee_position(robot, q_true)
    q, ok = ik_damped_ls(robot, target, q_true + rng.uniform(-0.2, 0.2, 7))
    assert ok
    np.testing.assert_allclose(ee_position(robot, q), target, atol=1e-3)


def test_straight_line_moves_toward_goal(robot):
    w = _world(robot, np.zeros((0, 3)), np.zeros((0, 3, 3)))
    hlp = StraightLineHLP(w, robot, lookahead=0.3)
    q = np.zeros(7)
    wp = hlp.get_waypoint(q)
    d0 = np.linalg.norm(w.goal - q)
    d1 = np.linalg.norm(w.goal - wp)
    assert d1 < d0
    np.testing.assert_allclose(np.linalg.norm(wp - q), 0.3, atol=1e-9)


def test_rrt_star_waypoint_avoids_obstacles(robot):
    # a box sitting between start and goal end-effector positions
    start = np.zeros(7)
    goal = np.array([1.2, 0.4, 0.0, 0.4, 0.0, 0.3, 0.0])
    p0 = ee_position(robot, start)
    p1 = ee_position(robot, goal)
    mid = 0.5 * (p0 + p1)
    w = _world(robot, mid[None], np.diag([0.05, 0.05, 0.05])[None],
               start=start, goal=goal)
    hlp = EndEffectorRRTStarHLP(w, robot, lookahead=0.2, max_nodes=300, seed=1)
    wp = hlp.get_waypoint(start)
    assert wp.shape == (7,)
    assert np.all(np.isfinite(wp))
    # the tree found a path: every waypoint EE position stays outside the
    # buffered obstacle box
    path = hlp._path
    assert path is not None and len(path) >= 2
    d = np.abs(path - mid[None, :]) - (0.05 + 0.05)
    assert not np.any(np.all(d < 0, axis=1))


def test_rrt_star_waypoint_sits_lookahead_along_path(robot):
    """When the EE path is much longer than the lookahead, the returned
    waypoint must be a partial-progress configuration whose EE sits
    ~lookahead along the path — NOT the raw goal configuration (the
    round-3 walk-off bug returned the goal unconditionally)."""
    start = np.zeros(7)
    goal = np.array([1.2, 0.4, 0.0, 0.4, 0.0, 0.3, 0.0])
    w = _world(robot, np.zeros((0, 3)), np.zeros((0, 3, 3)),
               start=start, goal=goal)
    lookahead = 0.1
    hlp = EndEffectorRRTStarHLP(w, robot, lookahead=lookahead,
                                max_nodes=300, seed=5)
    wp = hlp.get_waypoint(start)
    path = hlp._path
    # the path is long enough that the lookahead point is strictly interior
    seg_len = np.linalg.norm(np.diff(path, axis=0), axis=1).sum()
    assert seg_len > 2 * lookahead
    # waypoint differs from the goal configuration ...
    assert np.linalg.norm(wp - goal) > 1e-3
    # ... and its EE position is ~lookahead arclength from the start EE
    p_wp = ee_position(robot, wp)
    p0 = ee_position(robot, start)
    assert np.linalg.norm(p_wp - p0) < 3 * lookahead


def test_lazy_prm_waypoint_sits_lookahead_along_path(robot):
    from armour_tpu.hlp import LazyPRMHLP

    start = np.zeros(7)
    goal = np.array([1.2, 0.4, 0.0, 0.4, 0.0, 0.3, 0.0])
    w = _world(robot, np.zeros((0, 3)), np.zeros((0, 3, 3)),
               start=start, goal=goal)
    lookahead = 0.1
    hlp = LazyPRMHLP(w, robot, lookahead=lookahead, seed=6)
    wp = hlp.get_waypoint(start)
    path = hlp._path
    seg_len = np.linalg.norm(np.diff(path, axis=0), axis=1).sum()
    assert seg_len > 2 * lookahead
    assert np.linalg.norm(wp - goal) > 1e-3
    p_wp = ee_position(robot, wp)
    p0 = ee_position(robot, start)
    assert np.linalg.norm(p_wp - p0) < 3 * lookahead


def test_config_rrt_star_waypoints_track_collision_free_path(robot):
    """Config-space RRT* (robot_arm_RRT_star_HLP.m): the path must exist,
    every node must keep the swept arm outside the buffered obstacles, and
    walking waypoints must make progress toward the goal."""
    start = np.zeros(7)
    goal = np.array([1.0, 0.4, 0.0, 0.4, 0.0, 0.3, 0.0])
    p0 = ee_position(robot, start)
    p1 = ee_position(robot, goal)
    mid = 0.5 * (p0 + p1)
    w = _world(robot, mid[None], np.diag([0.04, 0.04, 0.04])[None],
               start=start, goal=goal)
    hlp = ConfigRRTStarHLP(w, robot, lookahead=0.4, max_nodes=250, seed=3)
    wp = hlp.get_waypoint(start)
    assert wp.shape == (7,)
    assert np.all(np.isfinite(wp))
    path = hlp._path
    assert path is not None and len(path) >= 2
    for qn in path:
        assert hlp._config_free(qn)
    # iterating waypoints eventually converges to the goal configuration
    # (the connect-style path may detour around the obstacle, so allow the
    # full path length rather than a fixed step count)
    q = start.copy()
    reached = False
    for _ in range(40):
        q = hlp.get_waypoint(q)
        if np.linalg.norm(q - goal) < 1e-9:
            reached = True
            break
    assert reached, np.linalg.norm(q - goal)


def test_config_rrt_star_empty_world_heads_to_goal(robot):
    w = _world(robot, np.zeros((0, 3)), np.zeros((0, 3, 3)))
    hlp = ConfigRRTStarHLP(w, robot, lookahead=0.3, max_nodes=150, seed=4)
    q = np.zeros(7)
    wp = hlp.get_waypoint(q)
    assert np.linalg.norm(w.goal - wp) < np.linalg.norm(w.goal - q)


def test_rrt_star_ik_failure_falls_back_to_goal(robot):
    start = np.zeros(7)
    goal = np.full(7, 0.3)
    w = _world(robot, np.zeros((0, 3)), np.zeros((0, 3, 3)), start=start, goal=goal)
    hlp = EndEffectorRRTStarHLP(w, robot, max_nodes=50, seed=2)
    # force an unreachable path target: overwrite the path with a far point
    hlp._path = np.array([[5.0, 5.0, 5.0], [6.0, 6.0, 6.0]])
    wp = hlp.get_waypoint(start)
    np.testing.assert_allclose(wp, goal)


def test_lazy_prm_waypoint_avoids_obstacles(robot):
    from armour_tpu.hlp import LazyPRMHLP

    start = np.zeros(7)
    goal = np.array([1.2, 0.4, 0.0, 0.4, 0.0, 0.3, 0.0])
    p0 = ee_position(robot, start)
    p1 = ee_position(robot, goal)
    mid = 0.5 * (p0 + p1)
    w = _world(robot, mid[None], np.diag([0.05, 0.05, 0.05])[None],
               start=start, goal=goal)
    hlp = LazyPRMHLP(w, robot, lookahead=0.15, seed=2)
    wp = hlp.get_waypoint(start)
    assert wp.shape == (7,)
    assert np.all(np.isfinite(wp))
    # the roadmap path must not pass through the (buffered) obstacle
    path = hlp._path
    assert path is not None and len(path) >= 2
    from armour_tpu.hlp import _segment_hits_boxes
    for a, b in zip(path[:-1], path[1:]):
        assert not _segment_hits_boxes(a, b, hlp.obs_c, hlp.obs_half)
    # and the path actually reaches the goal EE position
    np.testing.assert_allclose(path[-1], hlp.goal_p, atol=1e-9)


def test_lazy_prm_open_space_progress(robot):
    from armour_tpu.hlp import LazyPRMHLP

    w = _world(robot, np.zeros((0, 3)), np.zeros((0, 3, 3)),
               start=np.zeros(7), goal=np.full(7, 0.4))
    hlp = LazyPRMHLP(w, robot, lookahead=0.15, seed=3)
    q = np.zeros(7)
    wp = hlp.get_waypoint(q)
    p_wp = ee_position(robot, wp)
    p_q = ee_position(robot, q)
    g = ee_position(robot, w.goal)
    assert np.linalg.norm(g - p_wp) < np.linalg.norm(g - p_q) + 1e-6
