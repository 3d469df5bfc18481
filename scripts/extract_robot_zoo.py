"""Extract the multi-robot model zoo from the reference URDFs into a
self-contained JSON data bundle (armour_tpu/models/zoo_data.json).

Run once at development time; the framework itself only reads the JSON.
The reference supports these robots through urdfs/ + load_robot_params.m
(SURVEY.md section 2.2); we extract the same kinematic/inertial data with
our own parser (armour_tpu/models/urdf.py) and store plain numeric arrays.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from armour_tpu.models.urdf import load_urdf

REF = Path("/root/reference/urdfs")

ZOO = {
    "kinova_urdf": REF / "kinova_gen3_7dof" / "kinova_arm.urdf",
    "kinova_dumbbell": REF / "kinova_gen3_7dof" / "kinova_with_dumbbell.urdf",
    "fetch_arm": REF / "fetch_arm" / "fetch_arm_7DOF.urdf",
    "kuka_iiwa": REF / "kuka_arm" / "lbr_iiwa7_r800.urdf",
    "panda": REF / "panda_arm" / "panda_arm.urdf",
    "ur5": REF / "ur5_arm" / "ur5_robot.urdf",
}


def _read(path: Path) -> str:
    text = path.read_text()
    if path.name == "ur5_robot.urdf":
        # the reference ships the elbow-to-end-effector section commented
        # out; restore it (one comment block from elbow_joint to ee_link).
        # Anchor the closing-marker replacement AFTER the opening marker so
        # an unrelated earlier comment block can never be corrupted.
        start = text.find('<!-- <joint name="elbow_joint"')
        assert start >= 0, "expected commented elbow block in ur5_robot.urdf"
        end = text.find("</link> -->", start)
        assert end >= 0, "unterminated elbow comment block in ur5_robot.urdf"
        block = text[start:end + len("</link> -->")]
        fixed = block.replace('<!-- <joint name="elbow_joint"',
                              '<joint name="elbow_joint"', 1)
        fixed = fixed[: -len("</link> -->")] + "</link>"
        text = text[:start] + fixed + text[end + len("</link> -->"):]
    return text


# Kinova Gen3 transmission (motor) inertia: URDFs do not carry motor
# inertia, so the reference hard-codes it into every Kinova agent
# ("matlab doesn't import these from urdf", kinova_run_100_worlds.m:95).
# The dumbbell variant is the same physical arm, so it gets the same values.
KINOVA_ARMATURE = [8.02999999999999936, 11.99620246153036440, 9.00254278617515169,
                   11.58064393167063599, 8.46650409179141228, 8.85370693737424297,
                   8.85873036646853151]


def main():
    import io

    from armour_tpu.models.mesh import link_boxes_from_urdf

    out = {}
    for name, path in ZOO.items():
        try:
            # mesh-derived per-link AABBs (create_pz_bounding_boxes.m,
            # uarmtd_agent.m:60); links without resolvable geometry keep
            # load_urdf's conservative joint-span fallback
            boxes = link_boxes_from_urdf(io.StringIO(_read(path)),
                                         mesh_dir=str(path.parent))
            robot = load_urdf(io.StringIO(_read(path)), name=name,
                              link_boxes=boxes)
            n_mesh = sum(1 for _ in boxes)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        if name in ("kinova_urdf", "kinova_dumbbell"):
            arm = np.zeros(robot.num_joints)
            arm[:7] = KINOVA_ARMATURE
            robot = __import__("dataclasses").replace(robot, armature=arm)
        d = {}
        for field in (
            "num_joints", "num_factors", "axes", "trans", "rots", "mass",
            "com", "inertia", "friction", "damping", "armature",
            "position_limits_lb", "position_limits_ub", "speed_limits",
            "torque_limits", "gravity", "link_center", "link_generators",
        ):
            v = getattr(robot, field)
            d[field] = v.tolist() if isinstance(v, np.ndarray) else v
        d["mesh_boxes"] = n_mesh
        out[name] = d
        print(f"ok   {name}: J={robot.num_joints} F={robot.num_factors} "
              f"mass={robot.mass.sum():.2f}kg mesh_boxes={n_mesh}")
    dst = Path(__file__).resolve().parents[1] / "armour_tpu" / "models" / "zoo_data.json"
    dst.write_text(json.dumps(out, indent=1))
    print(f"wrote {dst} ({len(out)} robots)")


if __name__ == "__main__":
    main()
