import time, numpy as np, jax, jax.numpy as jnp, dataclasses
from armour_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from armour_tpu.utils.timing import bench
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_batch_planner

robot = kinova_gen3()
B = 64
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5,0.5,(B,7)).astype(np.float32))
zeros = jnp.zeros((B,7),jnp.float32)
q_des = q0 + 0.04
c = np.array([[0.6,0.6,0.6],[-0.6,-0.5,0.8]]); g = np.stack([np.diag([0.05]*3)]*2)

for o,i,label in [(0,0,"build-only"),(8,6,"full"),(4,4,"light")]:
    cfg = ArmourConfig(dtype=jnp.float32, solver_outer_iters=o, solver_inner_iters=i)
    obs1 = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)
    obs = jax.tree.map(lambda x: jnp.broadcast_to(x[None],(B,)+x.shape), obs1)
    step = make_batch_planner(robot, cfg)
    t, out = bench(lambda: step(q0,zeros,zeros,q_des,obs), iters=3)
    print(f"{label} (o={o},i={i}) batch={B}: {1e3*t:.1f}ms -> {B/t:.1f}/s feasible={int(np.asarray(out.feasible).sum())}", flush=True)
