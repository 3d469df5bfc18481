"""Replace provably-impossible scenes in a world suite with solvable ones.

Usage: python scripts/regenerate_unsolvable.py results_worlds.json saved_worlds/random

Reads the solvability verdicts scripts/classify_stuck.py attached to a
results file; every scene whose verdict is `static_blocked` or
`no_path_found` is regenerated (same obstacle count, solvability-checked
sampler) IN PLACE under its original filename.  The reference's generator
never produces unreachable goals (kinova_world_static.m:151-305 samples
obstacles only around the start/goal poses in a reachable workspace), so
pruning impossible scenes restores comparability of the 'stuck' bucket.
A sidecar JSON records which scenes were replaced and why.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np


def main():
    results = sys.argv[1] if len(sys.argv) > 1 else "results_worlds.json"
    world_dir = sys.argv[2] if len(sys.argv) > 2 else "saved_worlds/random"
    from armour_tpu.models.kinova import kinova_gen3
    from armour_tpu.worlds import load_world_csv, random_world, save_world_csv

    robot = kinova_gen3()
    with open(results) as f:
        doc = json.load(f)
    replaced = []
    rng = np.random.default_rng(20260821)
    for rec in doc["results"]:
        v = rec.get("solvability")
        if not v or v["verdict"] not in ("static_blocked", "no_path_found",
                                         "frs_blocked_start",
                                         "frs_blocked_goal"):
            continue
        path = os.path.join(world_dir, rec["world"])
        old = load_world_csv(path)
        w = random_world(rng, robot, old.num_obstacles, ensure_solvable=True)
        save_world_csv(w, path)
        replaced.append({"world": rec["world"], "verdict": v["verdict"],
                         "n_obstacles": int(old.num_obstacles)})
        print(f"regenerated {rec['world']} ({v['verdict']}, "
              f"{old.num_obstacles} obstacles)", flush=True)
    sidecar = os.path.join(world_dir, "REGENERATED.json")
    with open(sidecar, "w") as f:
        json.dump({"replaced": replaced, "source_results": results}, f, indent=1)
    print(f"{len(replaced)} scenes replaced; log in {sidecar}")


if __name__ == "__main__":
    main()
