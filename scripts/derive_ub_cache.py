"""Regenerate armour_tpu/models/ub_cache.json — per-robot UltimateBound
constants (mass-matrix eigenvalue bracket + co-derived V_max/eps).

The derivation (config.derive_ultimate_bound) costs a few seconds of jit +
eigensolve per robot; caching keeps ArmourConfig.for_robot() instant.
Run after changing zoo_data.json or the derivation itself:

    python scripts/derive_ub_cache.py
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# run on host CPU in float64: the eigenvalue bracket wants f64 and must not
# contend for the single tunneled TPU (the JAX_PLATFORMS env var is
# overridden in this image; only the config update reliably selects CPU)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from armour_tpu.config import _ub_cache_key, derive_ultimate_bound  # noqa: E402
from armour_tpu.models import zoo  # noqa: E402
from armour_tpu.models.kinova import kinova_gen3  # noqa: E402


def main():
    out = {}
    robots = [kinova_gen3()] + [zoo.load_zoo_robot(n) for n in zoo.list_robots()]
    for r in robots:
        t0 = time.perf_counter()
        ub = derive_ultimate_bound(r, use_cache=False)
        dt = time.perf_counter() - t0
        key = _ub_cache_key(r, 10.0, 5.0, 512, 0, 0.1, 0.4)
        out[key] = dataclasses.asdict(ub)
        print(f"{r.name}: m_min={ub.m_min:.4g} m_max={ub.m_max:.4g} "
              f"v_max={ub.v_max:.4g} eps={ub.eps:.4g} qde={ub.qde:.4g} "
              f"min_speed={float(min(r.speed_limits)):.4g}  [{dt:.1f}s]")

    p = Path(__file__).resolve().parent.parent / "armour_tpu" / "models" / "ub_cache.json"
    p.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
