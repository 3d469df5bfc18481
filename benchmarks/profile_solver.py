import time, numpy as np, jax, jax.numpy as jnp
from armour_tpu.collision import pad_obstacles, build_hyperplanes
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import plan_step
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.dynamics import torque_frs
from armour_tpu.nlp import PlanProblem, constraint_stack, solve
from armour_tpu.pz.basis import make_basis
import dataclasses

robot = kinova_gen3(); basis = make_basis(7,3)
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5,0.5,7).astype(np.float32))
qd0 = jnp.zeros(7,jnp.float32); qdd0 = jnp.zeros(7,jnp.float32)
q_des = q0 + 0.04
c = np.array([[0.6,0.6,0.6],[-0.6,-0.5,0.8]]); g = np.stack([np.diag([0.05]*3)]*2)

cfg = ArmourConfig(dtype=jnp.float32)
obs = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)

@jax.jit
def build_prob(q0,qd0,qdd0,q_des,obs):
    jrs = build_jrs(q0,qd0,qdd0,robot,cfg,basis)
    links = forward_occupancy(jrs,robot,cfg,basis)
    frs = reduce_links(links,basis)
    tq = torque_frs(jrs,robot,cfg,basis)
    hyp = build_hyperplanes(frs,obs)
    return PlanProblem(traj=jrs.traj,q_des=q_des,torque=tq,frs=frs,hyp=hyp,obs=obs)

def timeit(name, fn, *a, n=3):
    out = fn(*a); jax.block_until_ready(out)
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); out = fn(*a); jax.block_until_ready(out); ts.append(time.perf_counter()-t0)
    print(f"{name}: {1e3*min(ts):.2f}ms", flush=True)
    return out

prob = timeit("build_prob", build_prob, q0,qd0,qdd0,q_des,obs)

cstack = jax.jit(lambda k: constraint_stack(k, prob, robot, cfg, basis, with_grad=True))
k = jnp.zeros(7, jnp.float32)
timeit("cstack_grad", cstack, k, n=5)
cstack_ng = jax.jit(lambda k: constraint_stack(k, prob, robot, cfg, basis, with_grad=False))
timeit("cstack_nograd", cstack_ng, k, n=5)

for (o,i) in [(2,2),(4,5),(12,10)]:
    cfg2 = dataclasses.replace(cfg, solver_outer_iters=o, solver_inner_iters=i)
    sv = jax.jit(lambda p: solve(p, robot, cfg2, basis))
    timeit(f"solve o={o} i={i}", sv, prob, n=2)
