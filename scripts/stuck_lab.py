"""Stuck-tail lab: closed-loop variant sweep over the suite's stuck worlds.

Usage: python scripts/stuck_lab.py [results.json] [world_dir] [out.json]

Takes every world the results file marks stuck with a planner_failure /
padding_blocked verdict (i.e. a guidance path exists — the planner should
have made it) and re-runs JUST those worlds batched under a grid of
planner/guidance variants, reporting which worlds each variant recovers.
This is the measurement layer behind the suite's second-pass retry: only
variants that demonstrably recover goals get promoted into it.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import glob
import json

import jax.numpy as jnp
import numpy as np

from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import strong_config
from armour_tpu.utils.cache import enable_persistent_cache
from armour_tpu.worlds import load_world_csv


def main():
    enable_persistent_cache()
    results = sys.argv[1] if len(sys.argv) > 1 else "results_worlds.json"
    world_dir = sys.argv[2] if len(sys.argv) > 2 else "saved_worlds/random"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/stuck_lab.json"

    from armour_tpu.batch_sim import run_trials_batched

    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float32)

    with open(results) as f:
        doc = json.load(f)
    names = [r["world"] for r in doc["results"] if r["bucket"] == "stuck"]
    # original suite index of each stuck world, for true-param parity
    all_names = [r["world"] for r in doc["results"]]
    idxs = [all_names.index(n) for n in names]
    worlds = [load_world_csv(os.path.join(world_dir, n)) for n in names]
    print(f"{len(worlds)} stuck worlds", flush=True)

    variants = {
        "baseline": {},
        "seed1000": {"seed": 1000},
        "strong_primary": {"cfg": strong_config(cfg)},
        "lookahead_0.5": {"lookahead": 0.5},
        "fb_lookahead_0.2": {"fallback_kwargs": {"lookahead": 0.2}},
        "fb_nodes_3000": {"fallback_kwargs": {"max_nodes": 3000}},
        "stop_8": {"stop_threshold": 8},
        "iters_1000": {"max_iterations": 1000},
    }
    only = os.environ.get("STUCK_LAB_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}
    report = {}
    for vname, kw in variants.items():
        kw = dict(kw)
        vcfg = kw.pop("kw_cfg", None) or kw.pop("cfg", cfg)
        seed = kw.pop("seed", 0)
        summaries = run_trials_batched(
            worlds, robot, vcfg, seed=seed, guidance="auto",
            rescue_solver=False, verbose=False,
            tp_indices=idxs, tp_total=len(all_names), **kw)
        rec = [n for n, s in zip(names, summaries) if s.goal_reached]
        unsafe = [n for n, s in zip(names, summaries)
                  if s.collision or s.torque_exceeded
                  or s.ultimate_bound_exceeded or s.joint_limit_exceeded]
        report[vname] = {"recovered": rec, "n": len(rec), "unsafe": unsafe}
        print(f"{vname}: {len(rec)}/{len(worlds)} recovered "
              f"{'UNSAFE:' + str(unsafe) if unsafe else ''}", flush=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
