import time, numpy as np, jax, jax.numpy as jnp
from armour_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from armour_tpu.utils.timing import bench
from armour_tpu.collision import pad_obstacles, build_hyperplanes, screen_collision
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.dynamics import torque_frs
from armour_tpu.nlp import PlanProblem, solve
from armour_tpu.pz.basis import make_basis

robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32); basis = make_basis(7,3)
B = 64
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5,0.5,(B,7)).astype(np.float32))
zeros = jnp.zeros((B,7),jnp.float32)
q_des = q0 + 0.04
c = np.array([[0.6,0.6,0.6],[-0.6,-0.5,0.8]]); g = np.stack([np.diag([0.05]*3)]*2)
obs1 = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)
obs = jax.tree.map(lambda x: jnp.broadcast_to(x[None],(B,)+x.shape), obs1)

def build1(q0,qd0,qdd0,qd_,o):
    jrs = build_jrs(q0,qd0,qdd0,robot,cfg,basis)
    links = forward_occupancy(jrs,robot,cfg,basis)
    frs = reduce_links(links,basis)
    tq = torque_frs(jrs,robot,cfg,basis)
    hyp = build_hyperplanes(frs,obs1.__class__(centers=o.centers,generators=o.generators,mask=o.mask))
    sc = screen_collision(hyp,o,frs,cfg.screen_k)
    return PlanProblem(traj=jrs.traj,q_des=qd_,torque=tq,frs=frs,hyp=hyp,obs=o,screened=sc)

build = jax.jit(jax.vmap(build1))
t, prob = bench(lambda: build(q0,zeros,zeros,q_des,obs), iters=3)
print(f"build batch={B}: {1e3*t:.1f}ms", flush=True)

sv = jax.jit(jax.vmap(lambda p: solve(p, robot, cfg, basis)))
t, out = bench(lambda: sv(prob), iters=3)
print(f"solve batch={B}: {1e3*t:.1f}ms feasible={int(np.asarray(out.feasible).sum())}", flush=True)

# also reachset-only split
def reach1(q0,qd0,qdd0):
    jrs = build_jrs(q0,qd0,qdd0,robot,cfg,basis)
    links = forward_occupancy(jrs,robot,cfg,basis)
    frs = reduce_links(links,basis)
    tq = torque_frs(jrs,robot,cfg,basis)
    return frs.radius.sum()+tq.torque_radius.sum()
reach = jax.jit(jax.vmap(reach1))
t, _ = bench(lambda: reach(q0,zeros,zeros), iters=3)
print(f"reachsets batch={B}: {1e3*t:.1f}ms", flush=True)
