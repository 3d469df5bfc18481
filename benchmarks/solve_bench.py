import time, numpy as np, jax, jax.numpy as jnp
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner

robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32)
step = make_planner(robot, cfg)
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5,0.5,7).astype(np.float32))
qd0 = jnp.zeros(7); qdd0 = jnp.zeros(7)
q_des = q0 + 0.04
c = np.array([[0.6,0.6,0.6],[-0.6,-0.5,0.8]]); g = np.stack([np.diag([0.05]*3)]*2)
obs = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)

t0=time.perf_counter(); out = step(q0,qd0,qdd0,q_des,obs); jax.block_until_ready(out)
print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(3):
    t0=time.perf_counter(); out = step(q0,qd0,qdd0,q_des,obs); jax.block_until_ready(out)
    print(f"run {1e3*(time.perf_counter()-t0):.2f}ms feasible={bool(out.feasible)} k={np.asarray(out.k).round(3)}", flush=True)
