"""Per-stage timing at batch=64, all inputs as jit args (no closure constants).

Run: python -m benchmarks.stage_bench64
"""
import numpy as np, jax, jax.numpy as jnp

from armour_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from armour_tpu.utils.timing import bench
from armour_tpu.collision import pad_obstacles, build_hyperplanes, screen_collision
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.dynamics import torque_frs
from armour_tpu.pz.basis import make_basis

robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32); basis = make_basis(7, 3)
B = 64
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)).astype(np.float32))
zeros = jnp.zeros((B, 7), jnp.float32)
c = np.array([[0.6, 0.6, 0.6], [-0.6, -0.5, 0.8]]); g = np.stack([np.diag([0.05]) * 3] * 2)
g = np.stack([np.diag([0.05] * 3)] * 2)
obs1 = pad_obstacles(c, g, cfg.max_obstacles, cfg.dtype)
obs = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), obs1)

stages = {}
f_jrs = jax.jit(jax.vmap(lambda a, b, cc: build_jrs(a, b, cc, robot, cfg, basis)))
t, jrs = bench(lambda: f_jrs(q0, zeros, zeros), iters=3); stages["jrs"] = t
f_fk = jax.jit(jax.vmap(lambda j: forward_occupancy(j, robot, cfg, basis)))
t, links = bench(lambda: f_fk(jrs), iters=3); stages["fk"] = t
f_red = jax.jit(jax.vmap(lambda l: reduce_links(l, basis)))
t, frs = bench(lambda: f_red(links), iters=3); stages["reduce"] = t
f_tq = jax.jit(jax.vmap(lambda j: torque_frs(j, robot, cfg, basis)))
t, tq = bench(lambda: f_tq(jrs), iters=3); stages["rnea"] = t
f_hyp = jax.jit(jax.vmap(build_hyperplanes))
t, hyp = bench(lambda: f_hyp(frs, obs), iters=3); stages["hyp"] = t
f_scr = jax.jit(jax.vmap(lambda h, o, f: screen_collision(h, o, f, cfg.screen_k)))
t, scr = bench(lambda: f_scr(hyp, obs, frs), iters=3); stages["screen"] = t
for k, v in stages.items():
    print(f"{k}: {1e3*v:.1f}ms", flush=True)
print(f"sum: {1e3*sum(stages.values()):.1f}ms for batch {B}")
