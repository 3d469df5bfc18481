"""Batched closed-loop simulation: many worlds stepped in lockstep on-device.

The reference runs its 100-world suite strictly serially (one MATLAB
simulator per world, kinova_run_100_worlds.m:102-193).  Here the whole
receding-horizon loop — plan, track, safety oracles, goal check — is vmapped
over a leading worlds axis, so one chip advances every trial one iteration
per jitted step; the host only updates per-world bookkeeping (active flags,
stop counters).  Finished worlds keep being simulated (static shapes) but
their results are masked out, mirroring serial semantics exactly.

Numerics match the serial path (same jitted functions under vmap), so
per-world outcomes are identical to run_trial up to floating-point
reassociation; tests/test_batch_sim.py checks bucket-for-bucket agreement.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .collision import ObstacleSet, pad_obstacles
from .config import ArmourConfig
from .planner import make_batch_planner
from .robot import RobotModel
from .simulator import (TrialSummary, TrueParams, make_oracles, make_rollout,
                        sample_true_params)
from .trajectory import PlanRef, advance_plan, desired_state, initial_plan
from .worlds import World


def stack_worlds(worlds: Sequence[World], cfg: ArmourConfig):
    """starts [W,F], goals [W,F], padded ObstacleSet with leading W axis."""
    starts = jnp.asarray(np.stack([w.start for w in worlds]), cfg.dtype)
    goals = np.stack([w.goal for w in worlds])
    obs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[pad_obstacles(w.obstacle_centers, w.obstacle_generators,
                        cfg.max_obstacles, cfg.dtype) for w in worlds],
    )
    return starts, goals, obs


def _batched_true_params(robot: RobotModel, rng: np.random.Generator, W: int,
                         scale: Optional[float]) -> TrueParams:
    tps = [sample_true_params(robot, rng, scale=scale) for _ in range(W)]
    return TrueParams(
        mass=jnp.stack([t.mass for t in tps]),
        inertia=jnp.stack([t.inertia for t in tps]),
        com=jnp.stack([t.com for t in tps]),
    )


def run_trials_batched(
    worlds: Sequence[World],
    robot: RobotModel,
    cfg: ArmourConfig,
    max_iterations: int = 500,   # kinova_run_100_worlds.m:64 max_sim_iter
    stop_threshold: int = 4,
    lookahead: float = 0.4,
    true_param_scale: Optional[float] = 1.0,
    seed: int = 0,
    goal_radius: float = np.pi / 30,
    verbose: bool = False,
    use_hlp: bool = True,
    hlp_lookahead: float = 0.1,
) -> List[TrialSummary]:
    """Run every world's closed-loop trial in lockstep (batched run_trial).

    use_hlp: guide each world with a host-side end-effector RRT* waypoint
    generator, the HLP the reference's 100-world benchmark runs
    (kinova_run_100_worlds.m:148, lookahead_distance=0.1 at line 57);
    False falls back to the straight-line waypoint."""
    W = len(worlds)
    F = robot.num_factors
    dt = cfg.dtype
    starts, goals_np, obs = stack_worlds(worlds, cfg)
    rng = np.random.default_rng(seed)
    tp = _batched_true_params(robot, rng, W, true_param_scale)
    hlps = None
    if use_hlp:
        from .hlp import EndEffectorRRTStarHLP

        hlps = [EndEffectorRRTStarHLP(w, robot, lookahead=hlp_lookahead,
                                      seed=seed + i)
                for i, w in enumerate(worlds)]

    planner = make_batch_planner(robot, cfg)
    rollout1 = make_rollout(robot, cfg)
    oracles1 = make_oracles(robot, cfg)
    rollout = jax.jit(jax.vmap(rollout1))
    oracles = jax.jit(jax.vmap(oracles1))

    k_range = jnp.asarray(cfg.k_range, dt)
    goals = jnp.asarray(goals_np, dt)

    cont = jnp.asarray(np.asarray(robot.continuous_joints, bool))

    @jax.jit
    def plan_inputs(ref: PlanRef):
        q0, qd0, qdd0 = jax.vmap(lambda r: desired_state(r, cfg.t_plan, cfg))(ref)
        # wrap ONLY continuous joints (robot_arm_straight_line_HLP.m:50);
        # wrapping a limited joint steers into its joint-limit wall
        d_plain = goals - q0
        d = jnp.where(cont, jnp.mod(d_plain + jnp.pi, 2 * jnp.pi) - jnp.pi, d_plain)
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        step = jnp.where(dist <= lookahead, d, d * (lookahead / jnp.maximum(dist, 1e-12)))
        return q0, qd0, qdd0, q0 + step

    @jax.jit
    def accept(ref: PlanRef, k, q0, qd0, qdd0):
        return jax.vmap(lambda r, kk, a, b, c: advance_plan(r, kk, a, b, c, cfg))(
            ref, k, q0, qd0, qdd0)

    @jax.jit
    def goal_reached(q):
        d = jnp.mod(q - goals + jnp.pi, 2 * jnp.pi) - jnp.pi
        return jnp.linalg.norm(d, axis=-1) <= goal_radius

    # per-world host bookkeeping
    active = np.ones(W, dtype=bool)
    flags = {name: np.zeros(W, dtype=bool) for name in
             ("collision", "torque_exceeded", "ultimate_bound_exceeded",
              "joint_limit_exceeded")}
    goal = np.zeros(W, dtype=bool)
    infeasible = np.zeros(W, dtype=np.int64)
    stop_count = np.zeros(W, dtype=np.int64)
    iterations = np.zeros(W, dtype=np.int64)
    plan_times: List[float] = []

    q = starts
    qd = jnp.zeros_like(q)
    ref = jax.vmap(lambda s: initial_plan(s, dt))(starts)

    wp_cache = np.asarray(goals_np, dtype=np.float64).copy()

    for it in range(max_iterations):
        q0, qd0, qdd0, waypoints = plan_inputs(ref)
        if hlps is not None:
            # host-side RRT* waypoints, only for still-active worlds
            # (inactive worlds keep their last waypoint; results are masked)
            q0h = np.asarray(q0, dtype=np.float64)
            for i in range(W):
                if active[i]:
                    wp_cache[i] = hlps[i].get_waypoint(q0h[i])
            waypoints = jnp.asarray(wp_cache, dt)
        t0 = time.perf_counter()
        res = planner(q0, qd0, qdd0, waypoints, obs)
        k = np.asarray(res.k)
        plan_times.append(time.perf_counter() - t0)

        feas = np.all(np.isfinite(k), axis=-1)
        infeasible += (~feas) & active
        # freeze bookkeeping for inactive worlds: a finished world's masked
        # simulation must not reset or advance its stuck counter
        stop_count = np.where(active, np.where(feas, 0, stop_count + 1),
                              stop_count)

        ref = accept(ref, jnp.asarray(k, dt), q0, qd0, qdd0)
        q, qd, logs = rollout(q, qd, ref, tp)
        checks = jax.tree.map(np.asarray, oracles(logs, obs))
        reached = np.asarray(goal_reached(q))

        iterations += active
        for name in flags:
            flags[name] |= checks[name] & active
        violated = np.zeros(W, dtype=bool)
        for name in flags:
            violated |= checks[name]
        goal |= reached & active & ~violated
        active &= ~violated & ~reached & (stop_count < stop_threshold)
        if verbose:
            print(f"iter {it}: active={int(active.sum())}/{W} goal={int(goal.sum())} "
                  f"feasible={int(feas.sum())}", flush=True)
        if not active.any():
            break

    # NOTE: amortized time — total batch wall-time split evenly across the W
    # lockstepped worlds (inactive worlds still consume batch time).  Not
    # comparable to the serial per-plan wall times run_trial records; use
    # `plan_times` (returned per batch iteration by callers that need it) for
    # raw throughput numbers.
    per_iter = [t / W for t in plan_times]
    return [
        TrialSummary(
            goal_reached=bool(goal[i]),
            collision=bool(flags["collision"][i]),
            torque_exceeded=bool(flags["torque_exceeded"][i]),
            ultimate_bound_exceeded=bool(flags["ultimate_bound_exceeded"][i]),
            joint_limit_exceeded=bool(flags["joint_limit_exceeded"][i]),
            infeasible_plans=int(infeasible[i]),
            iterations=int(iterations[i]),
            planning_times=per_iter[: int(iterations[i])],
            stuck=bool(stop_count[i] >= stop_threshold),
        )
        for i in range(W)
    ]
