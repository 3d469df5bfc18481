import time, numpy as np, jax, jax.numpy as jnp
from armour_tpu.collision import pad_obstacles, build_hyperplanes
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.dynamics import torque_frs
from armour_tpu.pz.basis import make_basis

robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32); basis = make_basis(7,3)
q0 = jnp.zeros(7); qd0 = jnp.zeros(7)+0.1; qdd0 = jnp.zeros(7)

def timeit(name, fn, *a):
    t0=time.perf_counter(); out = fn(*a); jax.block_until_ready(out); t1=time.perf_counter()
    t2=time.perf_counter(); out = fn(*a); jax.block_until_ready(out); t3=time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, run {1e3*(t3-t2):.2f}ms", flush=True)
    return out

jrs = timeit("jrs", jax.jit(lambda a,b,c: build_jrs(a,b,c,robot,cfg,basis)), q0,qd0,qdd0)
links = timeit("fk", jax.jit(lambda j: forward_occupancy(j,robot,cfg,basis)), jrs)
frs = timeit("reduce", jax.jit(lambda l: reduce_links(l,basis)), links)
tq = timeit("rnea2", jax.jit(lambda j: torque_frs(j,robot,cfg,basis)), jrs)
c = np.array([[0.5,0.5,0.5]]); g = np.stack([np.diag([0.05]*3)])
obs = pad_obstacles(c,g,cfg.max_obstacles,cfg.dtype)
hyp = timeit("hyp", jax.jit(lambda f: build_hyperplanes(f,obs)), frs)
