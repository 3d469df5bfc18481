"""Generate the 100-scene random world suite (kinova_create_random_worlds.m).

Usage: python scripts/generate_worlds.py [out_dir] [seed]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

from armour_tpu.experiments import generate_world_suite
from armour_tpu.models.kinova import kinova_gen3


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "saved_worlds/random"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    paths = generate_world_suite(out, kinova_gen3(), seed=seed)
    print(f"wrote {len(paths)} scenes to {out}")


if __name__ == "__main__":
    main()
