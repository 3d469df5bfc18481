import time, numpy as np, jax, jax.numpy as jnp
from armour_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from armour_tpu.collision import pad_obstacles, build_hyperplanes
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.dynamics import torque_frs
from armour_tpu.nlp import PlanProblem, constraint_stack
from armour_tpu.pz.basis import make_basis

robot = kinova_gen3(); basis = make_basis(7,3)
cfg = ArmourConfig(dtype=jnp.float32)
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5,0.5,7).astype(np.float32))
qd0 = jnp.zeros(7,jnp.float32); qdd0 = jnp.zeros(7,jnp.float32)
q_des = q0 + 0.04
c = np.array([[0.6,0.6,0.6]]); g = np.stack([np.diag([0.05]*3)])
obs = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)

@jax.jit
def build_prob(q0,qd0,qdd0,q_des,obs):
    jrs = build_jrs(q0,qd0,qdd0,robot,cfg,basis)
    links = forward_occupancy(jrs,robot,cfg,basis)
    frs = reduce_links(links,basis)
    tq = torque_frs(jrs,robot,cfg,basis)
    hyp = build_hyperplanes(frs,obs)
    return PlanProblem(traj=jrs.traj,q_des=q_des,torque=tq,frs=frs,hyp=hyp,obs=obs)
prob = build_prob(q0,qd0,qdd0,q_des,obs)
jax.block_until_ready(prob)

def timeit(name, fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); out = fn(*a); jax.block_until_ready(out); ts.append(time.perf_counter()-t0)
    print(f"{name}: {1e3*min(ts):.2f}ms", flush=True)

k1 = jnp.zeros(7, jnp.float32)
kb = jnp.zeros((64,7), jnp.float32)
cs1 = jax.jit(lambda k: constraint_stack(k, prob, robot, cfg, basis, with_grad=False)[0])
csb = jax.jit(jax.vmap(lambda k: constraint_stack(k, prob, robot, cfg, basis, with_grad=False)[0]))
timeit("cstack x1", cs1, k1)
timeit("cstack x64", csb, kb)

# collision-only
from armour_tpu.collision import collision_constraints
@jax.jit
def col_only(k):
    phi = basis.phi(k)
    p = (prob.frs.center_coef.reshape(-1, phi.shape[0]) @ phi).reshape(128, 7, 3)
    return collision_constraints(prob.hyp, prob.obs, p)[0]
timeit("collision only x1", col_only, k1)

@jax.jit
def torque_only(k):
    phi = basis.phi(k)
    return prob.torque.u_coef.reshape(-1, phi.shape[0]) @ phi
timeit("torque only x1", torque_only, k1)

@jax.jit
def state_only(k):
    from armour_tpu.nlp import joint_position_extrema, joint_velocity_extrema
    a = joint_position_extrema(k, prob.traj, cfg)
    b = joint_velocity_extrema(k, prob.traj, cfg)
    return a[0]+b[0]
timeit("state only x1", state_only, k1)

@jax.jit
def phi_only(k):
    return basis.phi(k)
timeit("phi x1", phi_only, k1)
