"""Benchmark: safe planning solves per second on real TPU hardware.

Measures the full planning iteration (JRS -> PZ FK/RNEA -> obstacle
hyperplanes -> NLP solve) at the reference configuration (Kinova Gen3 7-DOF,
128 time steps, saved-world-style obstacles) batched over worlds, and prints
ONE JSON line.

Baseline: the reference must finish one solve within its 0.5 s re-plan
budget (armour_main.cu:227-229), i.e. 2 solves/s/robot; vs_baseline is
solves-per-second divided by 2 (how many real-time robots one chip serves).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from armour_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from armour_tpu.collision import pad_obstacles
    from armour_tpu.config import ArmourConfig
    from armour_tpu.models.kinova import kinova_gen3
    from armour_tpu.planner import make_batch_planner

    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float32)
    batch = 64
    n_obs = 13

    rng = np.random.default_rng(0)
    q0 = rng.uniform(-0.5, 0.5, (batch, 7)).astype(np.float32)
    qd0 = rng.uniform(-0.2, 0.2, (batch, 7)).astype(np.float32)
    qdd0 = rng.uniform(-0.2, 0.2, (batch, 7)).astype(np.float32)
    q_des = (q0 + rng.uniform(-0.06, 0.06, (batch, 7))).astype(np.float32)

    def rand_obs(r):
        c = r.uniform(-1.0, 1.0, (n_obs, 3))
        c[:, 2] = r.uniform(0.3, 1.2, n_obs)
        # keep clear of the arm base column
        c[:, 0] += np.sign(c[:, 0]) * 0.55
        g = np.stack([np.diag(r.uniform(0.03, 0.15, 3)) for _ in range(n_obs)])
        return c, g

    obs_list = [rand_obs(rng) for _ in range(batch)]
    obs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[pad_obstacles(c, g, cfg.max_obstacles, cfg.dtype) for c, g in obs_list],
    )

    from armour_tpu.utils.timing import bench as _bench

    step = make_batch_planner(robot, cfg)
    args = (jnp.asarray(q0), jnp.asarray(qd0), jnp.asarray(qdd0), jnp.asarray(q_des), obs)

    dt, out = _bench(lambda: step(*args), iters=5)
    solves_per_s = batch / dt
    n_feasible = int(np.sum(np.asarray(out.feasible)))
    result = {
        "metric": "planning_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 2.0, 2),
        "batch": batch,
        "feasible": n_feasible,
        "latency_ms_per_batch": round(dt * 1e3, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
