"""Solvability oracle: verdicts separate planner weakness from impossible
worlds (VERDICT r4 weak #5 / next-round #3)."""

import numpy as np

from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.solvability import classify_world
from armour_tpu.worlds import World

ROBOT = kinova_gen3()


def _world(centers, sides, start=None, goal=None):
    centers = np.asarray(centers, float).reshape(-1, 3)
    gens = np.stack([np.diag(np.asarray(s, float) / 2.0) for s in sides]) \
        if len(centers) else np.zeros((0, 3, 3))
    return World(
        start=np.zeros(7) if start is None else np.asarray(start, float),
        goal=np.array([0.5, -0.3, 0.4, -0.6, 0.2, 0.3, -0.2]) if goal is None
        else np.asarray(goal, float),
        obstacle_centers=centers,
        obstacle_generators=gens,
    )


def test_open_world_is_planner_failure_class():
    """A world with one far-away obstacle has a padded path: if the suite
    marks it stuck, that is on the planner."""
    w = _world([[2.5, 2.5, 2.5]], [[0.1, 0.1, 0.1]])
    v = classify_world(w, ROBOT, max_nodes=800, frs_check=False)
    assert v["verdict"] == "planner_failure"
    assert v["path_padded"] and v["path_unpadded"]


def test_goal_inside_obstacle_is_static_blocked():
    """Goal configuration in collision for the bare skeleton: provably
    unsolvable."""
    from armour_tpu.hlp import _fk_points_batch

    goal = np.array([0.5, -0.3, 0.4, -0.6, 0.2, 0.3, -0.2])
    pts = _fk_points_batch(ROBOT, goal[None])[0]
    # box centered on the elbow point of the goal configuration
    w = _world([pts[3]], [[0.25, 0.25, 0.25]], goal=goal)
    v = classify_world(w, ROBOT, max_nodes=400, frs_check=False)
    assert v["verdict"] == "static_blocked"
    assert not v["goal_free"]


def test_verdict_mapping(monkeypatch):
    """The verdict ladder: padded-path -> planner_failure; unpadded-only ->
    padding_blocked; neither -> no_path_found (search outcomes mocked so the
    mapping itself is pinned deterministically)."""
    import armour_tpu.solvability as sv

    w = _world([[2.5, 2.5, 2.5]], [[0.1, 0.1, 0.1]])

    monkeypatch.setattr(sv, "_connects",
                        lambda world, robot, buffer, *a, **k: buffer == 0.0)
    v = sv.classify_world(w, ROBOT, frs_check=False)
    assert v["verdict"] == "padding_blocked"
    assert v["path_unpadded"] and not v["path_padded"]

    monkeypatch.setattr(sv, "_connects", lambda *a, **k: False)
    assert sv.classify_world(w, ROBOT, frs_check=False)["verdict"] \
        == "no_path_found"

    monkeypatch.setattr(sv, "_connects", lambda *a, **k: True)
    assert sv.classify_world(w, ROBOT, frs_check=False)["verdict"] \
        == "planner_failure"


def test_rest_frs_exact_verdicts():
    """The exact rest-FRS test overrides the capsule ladder: an obstacle
    grazing the START configuration's certified k=0 envelope (but not the
    bare skeleton) yields frs_blocked_start — the proof class the round-5
    suite regeneration keys on (scene_028_008 had start margin +0.028 while
    the 3 cm capsule oracle called it planner_failure)."""
    from armour_tpu.hlp import _fk_points_batch
    from armour_tpu.solvability import make_rest_frs_checker

    rest = make_rest_frs_checker(ROBOT)
    # open world: rest margin comfortably negative at start and goal
    w_open = _world([[2.5, 2.5, 2.5]], [[0.1, 0.1, 0.1]])
    assert rest(w_open.start, w_open) < 0.0
    assert rest(w_open.goal, w_open) < 0.0
    v = classify_world(w_open, ROBOT, max_nodes=800)
    assert v["verdict"] == "planner_failure"

    # box centered on the start's elbow: rest-FRS penetrates -> proof class
    pts = _fk_points_batch(ROBOT, np.asarray(w_open.start, float)[None])[0]
    w_blk = _world([pts[3]], [[0.3, 0.3, 0.3]])
    assert rest(w_blk.start, w_blk) > 0.0
    v = classify_world(w_blk, ROBOT)
    assert v["verdict"] == "frs_blocked_start"
    assert v["rest_frs_start"] > 0.0
