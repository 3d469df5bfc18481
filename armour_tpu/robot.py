"""Robot model: geometry, inertial parameters, limits, as dense arrays.

Plays the role of the reference's hard-coded KinovaWithoutGripperInfo.h plus
urdfs/urdf_utils/load_robot_params.m: a single data-driven structure that the
whole pipeline (JRS, PZ-FK, PZ-RNEA, controller, simulator) consumes.  Values
for the flagship Kinova Gen3 7-DOF are in models/kinova.py and were verified
against the reference header (KinovaWithoutGripperInfo.h:10-112).

Unlike the reference (recompile to change robot), this is pure data: any
serial manipulator is supported by constructing a RobotModel, e.g. via
models/urdf.py's minimal URDF parser.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def rpy_matrix(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """Fixed-frame rotation from roll/pitch/yaw, matching the reference's
    rotation constructor (PZsparse.cu:160-177)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.array(
        [
            [cp * cy, -cp * sy, sp],
            [cr * sy + cy * sp * sr, cr * cy - sp * sr * sy, -cp * sr],
            [sr * sy - cr * cy * sp, cy * sr + cr * sp * sy, cp * cr],
        ]
    )


@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Serial manipulator description (numpy, converted to jnp downstream).

    Shapes: J = num_joints (moving links), F = num_factors (actuated joints,
    trailing joints may be fixed).
    """

    name: str
    num_joints: int
    num_factors: int
    # per-joint rotation axis: 1/2/3 = x/y/z, 0 = fixed (KinovaWithoutGripperInfo.h:17)
    axes: np.ndarray               # [J] int
    trans: np.ndarray              # [J+1, 3] joint origin translation in parent frame
    rots: np.ndarray               # [J, 3] rpy of joint frame in parent frame
    rot_mats: np.ndarray           # [J, 3, 3] rpy_matrix(rots)
    mass: np.ndarray               # [J]
    com: np.ndarray                # [J, 3]
    inertia: np.ndarray            # [J, 3, 3] about COM, link frame
    mass_uncertainty: float        # fractional (0.03 = +-3%)
    inertia_uncertainty: float
    com_uncertainty: float
    friction: np.ndarray           # [J]
    damping: np.ndarray            # [J]
    armature: np.ndarray           # [J] transmission inertia
    position_limits_lb: np.ndarray  # [F] (1000 = continuous)
    position_limits_ub: np.ndarray  # [F]
    speed_limits: np.ndarray       # [F]
    torque_limits: np.ndarray      # [F]
    gravity: float
    # link bounding-box zonotopes in link frame (KinovaWithoutGripperInfo.h:84-99)
    link_center: np.ndarray        # [J, 3]
    link_generators: np.ndarray    # [J, 3] axis-aligned half-extents
    # which joints are continuous (wrap-to-pi in the cost; NLPclass.cu:225-231)
    continuous_joints: Optional[np.ndarray] = None  # [F] bool

    def __post_init__(self):
        if self.continuous_joints is None:
            object.__setattr__(
                self,
                "continuous_joints",
                np.asarray(self.position_limits_ub >= 999.0),
            )

    @property
    def mass_interval_radius(self) -> np.ndarray:
        return self.mass_uncertainty * np.abs(self.mass)

    @property
    def inertia_interval_radius(self) -> np.ndarray:
        return self.inertia_uncertainty * np.abs(self.inertia)
