"""Closed-loop run of the 7 hard scenarios (kinova_run_hard_scenarios.m)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys

import jax.numpy as jnp
import numpy as np

from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.experiments import SuiteResult, save_results, summarize
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner, make_rescue_planner
from armour_tpu.scenarios import all_hard_scenarios
from armour_tpu.simulator import run_trial, sample_true_params
from armour_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    out = sys.argv[1] if len(sys.argv) > 1 else "results_hard.json"
    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float32)
    step = make_planner(robot, cfg)
    rescue = make_rescue_planner(robot, cfg)
    rng = np.random.default_rng(0)
    results = []
    from armour_tpu.hlp import EndEffectorRRTStarHLP

    for i, world in enumerate(all_hard_scenarios(), start=1):
        obs = pad_obstacles(world.obstacle_centers, world.obstacle_generators,
                            cfg.max_obstacles, cfg.dtype)
        tp = sample_true_params(robot, rng, scale=1.0)
        # the reference's hard-scenario script guides with the EE RRT* HLP
        # (kinova_run_hard_scenarios.m:146, lookahead_distance=0.1)
        hlp = EndEffectorRRTStarHLP(world, robot, lookahead=0.1, seed=i)
        summary = run_trial(world, robot, cfg, step, obs, tp,
                            max_iterations=500, hlp=hlp, rescue_step=rescue)
        res = SuiteResult(world=f"hard_{i}", summary=summary)
        results.append(res)
        print(f"hard scenario {i}: {res.bucket()} iters={summary.iterations}", flush=True)
        save_results(results, out)
    print(json.dumps(summarize(results), indent=1))


if __name__ == "__main__":
    main()
