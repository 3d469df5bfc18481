import time, numpy as np, jax, jax.numpy as jnp
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_batch_planner

robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32)
batch = 8
rng = np.random.default_rng(0)
def make_args(seed):
    r = np.random.default_rng(seed)
    q0 = r.uniform(-0.5,0.5,(batch,7)).astype(np.float32)
    qd0 = r.uniform(-0.1,0.1,(batch,7)).astype(np.float32)
    qdd0 = np.zeros((batch,7),np.float32)
    q_des = q0 + r.uniform(-0.05,0.05,(batch,7)).astype(np.float32)
    obs_list = []
    for _ in range(batch):
        c = r.uniform(-1,1,(4,3)); c[:,2]=r.uniform(0.4,1.2,4); c[:,0]+=np.sign(c[:,0])*0.5
        g = np.stack([np.diag(r.uniform(0.03,0.1,3)) for _ in range(4)])
        obs_list.append(pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype))
    obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    return (jnp.asarray(q0),jnp.asarray(qd0),jnp.asarray(qdd0),jnp.asarray(q_des),obs)

step = make_batch_planner(robot, cfg)
a0 = make_args(1)
t0=time.perf_counter(); out = step(*a0); jax.block_until_ready(out); print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
for seed in (2,3,4):
    a = make_args(seed)
    jax.block_until_ready(a)
    t0=time.perf_counter(); out = step(*a); out2 = jax.block_until_ready(out)
    dt = time.perf_counter()-t0
    print(f"run {1e3*dt:.2f}ms feasible={np.asarray(out.feasible).sum()} k0={np.asarray(out.k)[0].round(2)}", flush=True)
