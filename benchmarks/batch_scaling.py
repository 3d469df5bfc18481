"""Throughput vs batch size for the full planning step (real TPU)."""
import time
import numpy as np, jax, jax.numpy as jnp

from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_batch_planner
from armour_tpu.utils.cache import enable_persistent_cache
from armour_tpu.utils.timing import bench

enable_persistent_cache()
robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32)
n_obs = 13
rng = np.random.default_rng(0)

def rand_obs(r):
    c = r.uniform(-1.0, 1.0, (n_obs, 3)); c[:, 2] = r.uniform(0.3, 1.2, n_obs)
    c[:, 0] += np.sign(c[:, 0]) * 0.55
    g = np.stack([np.diag(r.uniform(0.03, 0.15, 3)) for _ in range(n_obs)])
    return c, g

step = make_batch_planner(robot, cfg)
for batch in [16, 64, 128, 256]:
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, 7)), jnp.float32)
    qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (batch, 7)), jnp.float32)
    q_des = q0 + 0.04
    obs = jax.tree.map(lambda *xs: jnp.stack(xs),
                       *[pad_obstacles(*rand_obs(rng), cfg.max_obstacles, cfg.dtype)
                         for _ in range(batch)])
    try:
        dt, out = bench(lambda: step(q0, qd0, qd0, q_des, obs), iters=3)
        print(f"batch {batch}: {1e3*dt:.0f}ms  {batch/dt:.1f} solves/s", flush=True)
    except Exception as e:
        print(f"batch {batch}: FAIL {type(e).__name__}: {e}", flush=True)
        break
