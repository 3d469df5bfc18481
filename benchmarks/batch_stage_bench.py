"""Stage-level profile of the batched planner at bench.py's configuration.

The tunneled TPU platform's block_until_ready returns early (see
utils/timing.py), so each timing target is a jitted PREFIX of the pipeline
reduced to one scalar; float() on the scalar forces a true round-trip and
prefix deltas attribute time per stage *as composed* (fusion included).
"""
import time
import numpy as np, jax, jax.numpy as jnp

from armour_tpu.collision import (pad_obstacles, build_hyperplanes,
                                  screen_collision)
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.dynamics import torque_frs
from armour_tpu.nlp import PlanProblem, solve
from armour_tpu.pz.basis import make_basis
from armour_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
robot = kinova_gen3(); cfg = ArmourConfig(dtype=jnp.float32)
basis = make_basis(7, cfg.max_poly_degree)
batch = 64; n_obs = 13
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, 7)), jnp.float32)
qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (batch, 7)), jnp.float32)
qdd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (batch, 7)), jnp.float32)
q_des = q0 + 0.04

def rand_obs(r):
    c = r.uniform(-1.0, 1.0, (n_obs, 3)); c[:, 2] = r.uniform(0.3, 1.2, n_obs)
    c[:, 0] += np.sign(c[:, 0]) * 0.55
    g = np.stack([np.diag(r.uniform(0.03, 0.15, 3)) for _ in range(n_obs)])
    return c, g
obs = jax.tree.map(lambda *xs: jnp.stack(xs),
                   *[pad_obstacles(*rand_obs(rng), cfg.max_obstacles, cfg.dtype)
                     for _ in range(batch)])

def fingerprint(tree):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number))

def prefix(stage):
    def one(a, b, c, d, o):
        jrs = build_jrs(a, b, c, robot, cfg, basis)
        if stage == "jrs":
            return fingerprint(jrs)
        links = forward_occupancy(jrs, robot, cfg, basis)
        if stage == "fk":
            return fingerprint(links)
        frs = reduce_links(links, basis)
        if stage == "reduce":
            return fingerprint(frs)
        tq = torque_frs(jrs, robot, cfg, basis)
        if stage == "rnea":
            return fingerprint(tq) + fingerprint(frs)
        hyp = build_hyperplanes(frs, o)
        if stage == "hyp":
            return fingerprint((hyp.d, hyp.delta)) + fingerprint(tq)
        scr = screen_collision(hyp, o, frs, cfg.screen_k)
        if stage == "screen":
            return fingerprint((scr.d, scr.delta)) + fingerprint(tq)
        prob = PlanProblem(traj=jrs.traj, q_des=d, torque=tq, frs=frs,
                           hyp=hyp, obs=o, screened=scr)
        res = solve(prob, robot, cfg, basis)
        return jnp.sum(res.cost) + jnp.sum(res.feasible)

    return jax.jit(lambda a, b, c, d, o: jnp.sum(jax.vmap(one)(a, b, c, d, o)))

def timeit(name, fn, n=3):
    float(fn(q0, qd0, qdd0, q_des, obs))          # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(fn(q0, qd0, qdd0, q_des, obs))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1e3*min(ts):.1f}ms", flush=True)

for st in ["jrs", "fk", "reduce", "rnea", "hyp", "screen", "solve"]:
    timeit(st, prefix(st))
print("cfg:", cfg.solver_outer_iters, "outer x", cfg.solver_inner_iters,
      "inner, screen_k", cfg.screen_k, flush=True)
