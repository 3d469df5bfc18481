"""Single typed configuration for the whole framework.

The reference scatters its knobs across three uncoordinated layers
(compile-time macros in Parameters.h, MATLAB name-value args, script-top
user parameter blocks; see reference kinova_planner_realtime/Parameters.h and
kinova_src/scripts/kinova_run_100_worlds.m:19-98).  Cross-layer consistency
there is manual and fragile (k_range vs g_k_bernstein, V_max vs ultimate
bound constants, n_t 128 vs 96 readback).  Here ONE dataclass derives every
dependent constant, so they cannot drift.

Reference parity notes (file:line refer to the reference repo):
  - DURATION / NUM_TIME_STEPS / k_range: Parameters.h:14-21
  - SIMPLIFY_THRESHOLD: Parameters.h:10
  - obstacle caps: Parameters.h:26-29
  - violation thresholds: Parameters.h:38-41
  - cost scale: Parameters.h:44
  - ultimate bound constants: KinovaWithoutGripperInfo.h:102-112 and
    uarmtd_robust_CBF_LLC.m:6-12,37-41
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UltimateBound:
    """Tracking-error ultimate bound of the robust CBF controller.

    eps = sqrt(2 V_max / M_min) (uarmtd_robust_CBF_LLC.m:37-41).  The four
    derived radii qe/qde/qdae/qddae are exactly the extra generator radii
    injected into the JRS (Trajectory.cu:97,176,185,237).
    """

    alpha: float = 10.0
    v_max: float = 1e-2
    m_max: float = 15.79635774
    m_min: float = 5.095620491878957
    k_r: float = 5.0  # Kr gain

    @property
    def eps(self) -> float:
        return math.sqrt(2.0 * self.v_max / self.m_min)

    @property
    def qe(self) -> float:
        return self.eps / self.k_r

    @property
    def qde(self) -> float:
        return 2.0 * self.eps

    @property
    def qdae(self) -> float:
        return self.eps

    @property
    def qddae(self) -> float:
        return 2.0 * self.k_r * self.eps


@dataclasses.dataclass(frozen=True)
class ArmourConfig:
    """Planner + reachability + solver configuration."""

    # --- trajectory / reachable sets (Parameters.h:14-21) ---
    duration: float = 1.0
    t_plan: float = 0.5            # cost evaluated at t_plan; replan period
    num_time_steps: int = 128      # must be even (qd bounding trick)
    k_range: Tuple[float, ...] = tuple([math.pi / 48] * 7)

    # --- PZ arithmetic ---
    simplify_threshold: float = 5e-4   # Parameters.h:10
    max_poly_degree: int = 3           # total degree cap of tracked k-monomials
    # outward slop added to independent radii at every bilinear op to cover
    # non-directed floating point rounding (SURVEY.md section 7); relative.
    float_slop: float = 0.0

    # --- obstacles (Parameters.h:26-29) ---
    max_obstacles: int = 40
    obstacle_generators: int = 3

    # --- feasibility thresholds (Parameters.h:38-41) ---
    collision_violation_threshold: float = 1e-4
    torque_violation_threshold: float = 1e-2

    # --- cost (Parameters.h:44, NLPclass.cu:225-231) ---
    cost_scale: float = 10.0

    # --- solver (replaces Ipopt; armour_main.cu:246-253) ---
    solver_outer_iters: int = 8        # augmented-Lagrangian outer updates
    solver_inner_iters: int = 6        # projected-Newton inner steps
    screen_k: int = 4096               # collision rows kept in the hot loop
    solver_tol: float = 1e-4
    turn_off_input_constraints: bool = False

    # --- controller / ultimate bound ---
    ub: UltimateBound = dataclasses.field(default_factory=UltimateBound)

    # --- numerics ---
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        assert self.num_time_steps % 2 == 0, "NUM_TIME_STEPS must be even"

    @property
    def ds(self) -> float:
        return 1.0 / self.num_time_steps

    @classmethod
    def for_robot(cls, robot, **overrides) -> "ArmourConfig":
        """Config with per-factor knobs sized to the robot (the default
        k_range tuple is for the 7-DOF flagship)."""
        if "k_range" not in overrides:
            overrides["k_range"] = tuple([math.pi / 48] * robot.num_factors)
        return cls(**overrides)


DEFAULT_CONFIG = ArmourConfig()
