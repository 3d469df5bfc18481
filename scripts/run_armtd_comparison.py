"""ARMOUR vs ARMTD head-to-head on the same scenes (the reference's reason
for keeping kinova_planner_realtime_armtd_comparison/: armtd_main.cu,
uarmtd_planner.m:234-331).

Usage: python scripts/run_armtd_comparison.py [world_dir] [n_worlds] [out.json]

Runs BOTH trajectory families through the identical closed-loop batched
suite (same worlds, same oracles, same solver) and writes one artifact with
per-family buckets.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import glob
import json

import jax.numpy as jnp

from armour_tpu.config import ArmourConfig
from armour_tpu.experiments import (_provenance, run_world_suite_batched,
                                    summarize)
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    world_dir = sys.argv[1] if len(sys.argv) > 1 else "saved_worlds/reference"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    out = sys.argv[3] if len(sys.argv) > 3 else "results_armtd_comparison.json"
    paths = sorted(glob.glob(f"{world_dir}/*.csv"))
    if n:
        paths = paths[:n]
    robot = kinova_gen3()
    doc = {"world_dir": world_dir, "n_worlds": len(paths), "families": {}}
    for family in ("bernstein", "armtd"):
        cfg = ArmourConfig(dtype=jnp.float32, traj_family=family)
        results = run_world_suite_batched(paths, robot, cfg)
        summ = summarize(results)
        doc["families"][family] = {
            "summary": summ,
            "buckets": {os.path.basename(r.world): r.bucket()
                        for r in results},
        }
        print(f"{family}: {json.dumps(summ)}", flush=True)
    doc["provenance"] = _provenance()
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
