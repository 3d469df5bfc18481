"""The receding-horizon planner: one planning step as a single jitted program.

Replaces the reference's whole armour_main.cu process (file-based IPC +
OpenMP reachset loop + CUDA collision kernels + Ipopt): JRS construction,
PZ FK/RNEA, obstacle hyperplanes and the NLP solve all live in ONE jitted
function — no host round-trips inside a step (SURVEY.md section 2.3).

make_planner returns a compiled step; make_batch_planner vmaps it over
worlds, which is the TPU scale axis (thousands of independent planning
problems per step, sharded over the device mesh in parallel/batch.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .collision import (ObstacleSet, build_hyperplanes, pad_obstacles,
                        screen_collision)
from .config import ArmourConfig
from .dynamics import torque_frs
from .jrs import build_jrs
from .kinematics import forward_occupancy, reduce_links
from .nlp import PlanProblem, SolveResult, solve
from .pz.basis import make_basis
from .robot import RobotModel


def plan_step(q0, qd0, qdd0, q_des, obs: ObstacleSet, robot: RobotModel,
              cfg: ArmourConfig, basis, k0=None) -> SolveResult:
    """One full planning iteration (armour_main.cu main() equivalent)."""
    jrs = build_jrs(q0, qd0, qdd0, robot, cfg, basis)
    links = forward_occupancy(jrs, robot, cfg, basis)
    frs = reduce_links(links, basis)
    torque = torque_frs(jrs, robot, cfg, basis)
    hyp = build_hyperplanes(frs, obs)
    screened = screen_collision(hyp, obs, frs, cfg.screen_k)
    if cfg.grasp_constraints:
        from .grasp import GraspParams, grasp_frs

        grasp = grasp_frs(
            jrs, robot, cfg, basis,
            GraspParams(mu=cfg.grasp_mu,
                        support_radius=cfg.grasp_support_radius,
                        normal_axis=cfg.grasp_normal_axis),
        )
    else:
        grasp = None
    prob = PlanProblem(
        traj=jrs.traj,
        q_des=jnp.asarray(q_des, cfg.dtype),
        torque=torque,
        frs=frs,
        hyp=hyp,
        obs=obs,
        screened=screened,
        grasp=grasp,
    )
    return solve(prob, robot, cfg, basis, k0=k0)


def make_planner(robot: RobotModel, cfg: ArmourConfig):
    """Compile a single-world planning step: (q0, qd0, qdd0, q_des, obs) ->
    SolveResult."""
    basis = make_basis(robot.num_factors, cfg.max_poly_degree)

    @jax.jit
    def step(q0, qd0, qdd0, q_des, obs: ObstacleSet):
        return plan_step(q0, qd0, qdd0, q_des, obs, robot, cfg, basis)

    return step


def make_batch_planner(robot: RobotModel, cfg: ArmourConfig):
    """Compile a planner vmapped over a leading worlds axis."""
    basis = make_basis(robot.num_factors, cfg.max_poly_degree)

    @jax.jit
    def step(q0, qd0, qdd0, q_des, obs: ObstacleSet):
        fn = lambda a, b, c, d, o: plan_step(a, b, c, d, o, robot, cfg, basis)
        return jax.vmap(fn)(q0, qd0, qdd0, q_des, obs)

    return step
