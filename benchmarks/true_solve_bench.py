import time, numpy as np, jax, jax.numpy as jnp, dataclasses
from armour_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from armour_tpu.utils.timing import bench
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner, make_batch_planner

robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32)
rng = np.random.default_rng(0)

def make_single():
    q0 = jnp.asarray(rng.uniform(-0.5,0.5,7).astype(np.float32))
    return (q0, jnp.zeros(7,jnp.float32), jnp.zeros(7,jnp.float32), q0+0.04)

c = np.array([[0.6,0.6,0.6],[-0.6,-0.5,0.8]]); g = np.stack([np.diag([0.05]*3)]*2)
obs = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)

step = make_planner(robot, cfg)
a = make_single()
t, out = bench(lambda: step(*a, obs), iters=3)
print(f"single solve: {1e3*t:.1f}ms feasible={bool(out.feasible)}", flush=True)

for batch in (8, 64):
    q0 = jnp.asarray(rng.uniform(-0.5,0.5,(batch,7)).astype(np.float32))
    args = (q0, jnp.zeros((batch,7),jnp.float32), jnp.zeros((batch,7),jnp.float32), q0+0.04)
    obs_b = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (batch,)+x.shape), obs)
    stepb = make_batch_planner(robot, cfg)
    t, out = bench(lambda: stepb(*args, obs_b), iters=3)
    print(f"batch={batch}: {1e3*t:.1f}ms -> {batch/t:.1f} solves/s feasible={int(np.asarray(out.feasible).sum())}", flush=True)
