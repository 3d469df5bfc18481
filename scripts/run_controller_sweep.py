"""Robust-controller tracking-error sweep over model uncertainty
(kinova_compare_robust_controller.m).

Usage: python scripts/run_controller_sweep.py [results_controller_sweep.json]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import jax.numpy as jnp

from armour_tpu.config import ArmourConfig
from armour_tpu.experiments import robust_controller_sweep
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    out = sys.argv[1] if len(sys.argv) > 1 else "results_controller_sweep.json"
    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float32)
    res = robust_controller_sweep(robot, cfg, results_path=out)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
