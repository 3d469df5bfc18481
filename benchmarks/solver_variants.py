"""Solver timing vs batch and iteration counts: distinguishes latency-bound
(sequential tiny kernels in the fori_loop) from bandwidth/flop-bound.

Run: python -m benchmarks.solver_variants
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from armour_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from armour_tpu.utils.timing import bench
from armour_tpu.collision import (build_hyperplanes, pad_obstacles,
                                  screen_collision)
from armour_tpu.config import ArmourConfig
from armour_tpu.dynamics import torque_frs
from armour_tpu.jrs import build_jrs
from armour_tpu.kinematics import forward_occupancy, reduce_links
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.nlp import PlanProblem, solve
from armour_tpu.pz.basis import make_basis

robot = kinova_gen3()
cfg = ArmourConfig(dtype=jnp.float32)
basis = make_basis(7, 3)


def make_probs(B):
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)).astype(np.float32))
    zeros = jnp.zeros((B, 7), jnp.float32)
    q_des = q0 + 0.04
    c = np.array([[0.6, 0.6, 0.6], [-0.6, -0.5, 0.8]])
    g = np.stack([np.diag([0.05] * 3)] * 2)
    obs1 = pad_obstacles(c, g, cfg.max_obstacles, cfg.dtype)
    obs = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), obs1)

    @jax.jit
    def build(q0, qd0, qdd0, qd, o):
        def one(a, b, cc, d, oo):
            jrs = build_jrs(a, b, cc, robot, cfg, basis)
            links = forward_occupancy(jrs, robot, cfg, basis)
            frs = reduce_links(links, basis)
            torque = torque_frs(jrs, robot, cfg, basis)
            hyp = build_hyperplanes(frs, oo)
            screened = screen_collision(hyp, oo, frs, cfg.screen_k)
            return PlanProblem(traj=jrs.traj, q_des=d, torque=torque, frs=frs,
                               hyp=hyp, obs=oo, screened=screened)

        return jax.vmap(one)(q0, qd0, qdd0, qd, o)

    return build(q0, zeros, zeros, q_des, obs)


def time_solve(prob, B, outer, inner):
    cfg2 = dataclasses.replace(cfg, solver_outer_iters=outer,
                               solver_inner_iters=inner)

    @jax.jit
    def f(p):
        res = jax.vmap(lambda pp: solve(pp, robot, cfg2, basis))(p)
        return jnp.sum(res.cost) + jnp.sum(res.feasible)

    t, _ = bench(lambda: f(prob), iters=3)
    print(f"B={B} outer={outer} inner={inner}: {1e3 * t:.1f}ms "
          f"({1e3 * t / B:.2f}ms/world)", flush=True)


probs64 = make_probs(64)
time_solve(probs64, 64, 8, 6)
time_solve(probs64, 64, 8, 3)
time_solve(probs64, 64, 4, 6)
time_solve(probs64, 64, 1, 1)
probs1 = make_probs(1)
time_solve(probs1, 1, 8, 6)
