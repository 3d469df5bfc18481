"""Closed-loop benchmark over saved worlds (kinova_run_100_worlds.m).

Usage: python scripts/run_worlds.py [world_dir] [n_worlds] [results.json] [serial]

Default mode runs every world in lockstep on one chip
(batch_sim.run_trials_batched); pass a 4th arg "serial" for the per-world
loop (identical outcomes, much slower).
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import json

import jax.numpy as jnp

from armour_tpu.config import ArmourConfig
from armour_tpu.experiments import (run_world_suite, run_world_suite_batched,
                                    summarize)
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    world_dir = sys.argv[1] if len(sys.argv) > 1 else "saved_worlds/random"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    out = sys.argv[3] if len(sys.argv) > 3 else "results_worlds.json"
    serial = len(sys.argv) > 4 and sys.argv[4] == "serial"
    paths = sorted(glob.glob(f"{world_dir}/*.csv"))
    if n:
        paths = paths[:n]
    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float32)
    runner = run_world_suite if serial else run_world_suite_batched
    results = runner(paths, robot, cfg, results_path=out)
    print(json.dumps(summarize(results), indent=1))


if __name__ == "__main__":
    main()
