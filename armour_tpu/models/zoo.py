"""Multi-robot model zoo.

The reference supports a URDF zoo (urdfs/{kinova_gen3_7dof, fetch_arm,
kuka_arm, panda_arm, ur5_arm}, SURVEY.md section 2.2 "URDF zoo") loaded via
load_robot_params.m.  Here the same robots are available as RobotModel
constructors backed by a pre-extracted numeric bundle (zoo_data.json,
produced by scripts/extract_robot_zoo.py with our URDF parser); link
bounding boxes are the parser's conservative joint-span boxes unless a
mesh-derived set is supplied (the flagship Kinova in models/kinova.py
carries exact boxes).

All zoo robots run through the identical planning stack — the pipeline is
data-driven (robot.py), there is nothing robot-specific to recompile
(unlike the reference's KinovaWithoutGripperInfo.h / FetchInfo.h headers).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import numpy as np

from ..robot import RobotModel, rpy_matrix

_DATA = Path(__file__).parent / "zoo_data.json"


@functools.lru_cache(maxsize=None)
def _bundle() -> dict:
    return json.loads(_DATA.read_text())


def list_robots():
    return sorted(_bundle().keys())


def load_zoo_robot(name: str, mass_uncertainty: float = 0.03,
                   inertia_uncertainty: float = 0.03) -> RobotModel:
    d = _bundle()[name]
    arr = lambda k: np.asarray(d[k], dtype=np.float64)
    rots = arr("rots")
    return RobotModel(
        name=name,
        num_joints=int(d["num_joints"]),
        num_factors=int(d["num_factors"]),
        axes=np.asarray(d["axes"], dtype=np.int64),
        trans=arr("trans"),
        rots=rots,
        rot_mats=np.stack([rpy_matrix(*r) for r in rots]),
        mass=arr("mass"),
        com=arr("com"),
        inertia=arr("inertia"),
        mass_uncertainty=mass_uncertainty,
        inertia_uncertainty=inertia_uncertainty,
        com_uncertainty=0.0,
        friction=arr("friction"),
        damping=arr("damping"),
        armature=arr("armature"),
        position_limits_lb=arr("position_limits_lb"),
        position_limits_ub=arr("position_limits_ub"),
        speed_limits=arr("speed_limits"),
        torque_limits=arr("torque_limits"),
        gravity=float(d["gravity"]),
        link_center=arr("link_center"),
        link_generators=arr("link_generators"),
    )


def fetch_arm() -> RobotModel:
    """Fetch 7-DOF arm (the ARMTD-comparison robot, FetchInfo.h)."""
    return load_zoo_robot("fetch_arm")


def kuka_iiwa() -> RobotModel:
    """KUKA LBR iiwa7 R800 7-DOF."""
    return load_zoo_robot("kuka_iiwa")


def panda() -> RobotModel:
    """Franka Emika Panda 7-DOF."""
    return load_zoo_robot("panda")


def ur5() -> RobotModel:
    """Universal Robots UR5 6-DOF."""
    return load_zoo_robot("ur5")


def kinova_urdf() -> RobotModel:
    """Kinova Gen3 as parsed from the URDF (vs. the exact header-derived
    model in models/kinova.py)."""
    return load_zoo_robot("kinova_urdf")


def kinova_dumbbell() -> RobotModel:
    """Kinova Gen3 carrying the dumbbell payload
    (kinova_with_dumbbell.urdf, used by kinova_walking_lab_example.m)."""
    return load_zoo_robot("kinova_dumbbell")
