"""Cumulative per-stage timing: each prefix of the planning pipeline is
jitted end-to-end and returns ONE scalar, so the measurement excludes
host<->device transfer of intermediates (which dominates any per-stage bench
on the tunneled TPU).  Stage cost ~= difference of consecutive prefixes
(up to XLA fusion differences).

Run: python -m benchmarks.cumulative_stages [batch]
"""
import sys

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


def tree_scalar(x):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(x)
               if jnp.issubdtype(l.dtype, jnp.floating))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float32)
    basis = make_basis(7, 3)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)).astype(np.float32))
    zeros = jnp.zeros((B, 7), jnp.float32)
    q_des = q0 + 0.04
    c = np.array([[0.6, 0.6, 0.6], [-0.6, -0.5, 0.8]])
    g = np.stack([np.diag([0.05] * 3)] * 2)
    obs1 = pad_obstacles(c, g, cfg.max_obstacles, cfg.dtype)
    obs = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), obs1)

    def upto(stage):
        def one(q0, qd0, qdd0, qd, o):
            jrs = build_jrs(q0, qd0, qdd0, robot, cfg, basis)
            if stage == "jrs":
                return jrs
            links = forward_occupancy(jrs, robot, cfg, basis)
            if stage == "fk":
                return links
            frs = reduce_links(links, basis)
            if stage == "reduce":
                return frs
            torque = torque_frs(jrs, robot, cfg, basis)
            if stage == "rnea":
                return (frs, torque)
            hyp = build_hyperplanes(frs, o)
            if stage == "hyp":
                return (torque, hyp)
            screened = screen_collision(hyp, o, frs, cfg.screen_k)
            if stage == "screen":
                return (torque, screened)
            prob = PlanProblem(traj=jrs.traj, q_des=qd, torque=torque, frs=frs,
                               hyp=hyp, obs=o, screened=screened)
            return solve(prob, robot, cfg, basis)

        @jax.jit
        def f(q0, qd0, qdd0, qd, o):
            return tree_scalar(jax.vmap(
                lambda a, b, cc, d, oo: one(a, b, cc, d, oo))(q0, qd0, qdd0, qd, o))

        return f

    prev = 0.0
    for stage in ["jrs", "fk", "reduce", "rnea", "hyp", "screen", "solve"]:
        f = upto(stage)
        t, _ = bench(lambda: f(q0, zeros, zeros, q_des, obs), iters=3)
        print(f"upto {stage}: {1e3 * t:.1f}ms (delta {1e3 * (t - prev):.1f}ms)",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
