"""Experiment harness: world-suite generation, closed-loop runs, aggregation.

Covers the reference's kinova_src/scripts layer:
  * generate_world_suite  — kinova_create_random_worlds.m (100 scenes, 10 per
    obstacle count in {13,16,...,40}, CSV format of load_saved_world.m)
  * run_world_suite       — kinova_run_100_worlds.m (closed loop per scene,
    safety oracles, per-trial results)
  * summarize             — kinova_test_summary.m (bucket trials into
    collision / torque / ultimate-bound / joint-limit / goal / stuck;
    the paper's acceptance criterion is zero in the first four buckets)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import List, Optional, Sequence

import numpy as np

from .collision import pad_obstacles
from .config import ArmourConfig
from .planner import make_planner
from .robot import RobotModel
from .simulator import TrialSummary, run_trial, sample_true_params
from .worlds import World, load_world_csv, random_world, save_world_csv

DEFAULT_COUNTS = (13, 16, 19, 22, 25, 28, 31, 34, 37, 40)


def generate_world_suite(out_dir: str, robot: RobotModel,
                         counts: Sequence[int] = DEFAULT_COUNTS,
                         per_count: int = 10, seed: int = 0) -> List[str]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for n in counts:
        for i in range(per_count):
            w = random_world(rng, robot, n)
            path = os.path.join(out_dir, f"scene_{n:03d}_{i + 1:03d}.csv")
            save_world_csv(w, path)
            paths.append(path)
    return paths


@dataclasses.dataclass
class SuiteResult:
    world: str
    summary: TrialSummary

    def bucket(self) -> str:
        s = self.summary
        if s.collision:
            return "collision"
        if s.torque_exceeded:
            return "torque"
        if s.ultimate_bound_exceeded:
            return "ultimate_bound"
        if s.joint_limit_exceeded:
            return "joint_limit"
        if s.goal_reached:
            return "goal"
        return "stuck"


def run_world_suite(world_paths: Sequence[str], robot: RobotModel,
                    cfg: ArmourConfig, max_iterations: int = 150,
                    true_param_scale: Optional[float] = 1.0,
                    seed: int = 0, verbose: bool = True,
                    results_path: Optional[str] = None) -> List[SuiteResult]:
    from .simulator import make_oracles, make_rollout

    step = make_planner(robot, cfg)
    rollout = make_rollout(robot, cfg)
    oracles = make_oracles(robot, cfg)
    rng = np.random.default_rng(seed)
    results = []
    for path in world_paths:
        world = load_world_csv(path)
        obs = pad_obstacles(
            world.obstacle_centers, world.obstacle_generators,
            cfg.max_obstacles, cfg.dtype,
        )
        tp = sample_true_params(robot, rng, scale=true_param_scale)
        t0 = time.perf_counter()
        summary = run_trial(world, robot, cfg, step, obs, tp,
                            max_iterations=max_iterations,
                            rollout=rollout, oracles=oracles)
        res = SuiteResult(world=os.path.basename(path), summary=summary)
        results.append(res)
        if verbose:
            print(
                f"{res.world}: {res.bucket()} iters={summary.iterations} "
                f"infeasible={summary.infeasible_plans} "
                f"wall={time.perf_counter() - t0:.1f}s",
                flush=True,
            )
        if results_path:
            save_results(results, results_path)
    return results


def run_world_suite_batched(world_paths: Sequence[str], robot: RobotModel,
                            cfg: ArmourConfig, max_iterations: int = 150,
                            true_param_scale: Optional[float] = 1.0,
                            seed: int = 0, verbose: bool = True,
                            results_path: Optional[str] = None) -> List[SuiteResult]:
    """All worlds advanced in lockstep on one chip (batch_sim.run_trials_batched);
    orders of magnitude faster than the serial loop for the 100-world suite."""
    from .batch_sim import run_trials_batched

    worlds = [load_world_csv(p) for p in world_paths]
    t0 = time.perf_counter()
    summaries = run_trials_batched(
        worlds, robot, cfg, max_iterations=max_iterations,
        true_param_scale=true_param_scale, seed=seed, verbose=verbose,
    )
    results = [
        SuiteResult(world=os.path.basename(p), summary=s)
        for p, s in zip(world_paths, summaries)
    ]
    if verbose:
        print(f"batched suite: {len(worlds)} worlds in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    if results_path:
        save_results(results, results_path)
    return results


def summarize(results: Sequence[SuiteResult]) -> dict:
    """kinova_test_summary.m:34-66 buckets."""
    buckets = {
        "goal": 0, "collision": 0, "torque": 0, "ultimate_bound": 0,
        "joint_limit": 0, "stuck": 0,
    }
    plan_times = []
    for r in results:
        buckets[r.bucket()] += 1
        plan_times.extend(r.summary.planning_times)
    out = dict(buckets)
    out["n_trials"] = len(results)
    if plan_times:
        out["mean_planning_time_s"] = float(np.mean(plan_times))
        out["max_planning_time_s"] = float(np.max(plan_times))
    out["safe"] = (
        out["collision"] == 0 and out["torque"] == 0
        and out["ultimate_bound"] == 0 and out["joint_limit"] == 0
    )
    return out


def save_results(results: Sequence[SuiteResult], path: str) -> None:
    payload = []
    for r in results:
        d = dataclasses.asdict(r.summary)
        d["world"] = r.world
        d["bucket"] = r.bucket()
        d["planning_times"] = [float(x) for x in d["planning_times"]]
        payload.append(d)
    with open(path, "w") as f:
        json.dump({"results": payload, "summary": summarize(results)}, f, indent=1)
