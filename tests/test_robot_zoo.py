"""Multi-robot zoo: every extracted robot runs through the full planning
stack (the reference's cross-robot support, urdfs/ + load_robot_params.m +
FetchInfo.h; SURVEY.md section 2.2 'URDF zoo')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from armour_tpu import rnea_numeric
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models import zoo
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner

ALL = zoo.list_robots()


def test_zoo_lists_reference_robots():
    for name in ["fetch_arm", "kuka_iiwa", "panda", "ur5", "kinova_urdf",
                 "kinova_dumbbell"]:
        assert name in ALL


@pytest.mark.parametrize("name", ALL)
def test_zoo_model_shapes(name):
    r = zoo.load_zoo_robot(name)
    J, F = r.num_joints, r.num_factors
    assert r.axes.shape == (J,)
    assert r.trans.shape == (J + 1, 3)
    assert r.mass.shape == (J,)
    assert r.inertia.shape == (J, 3, 3)
    assert r.torque_limits.shape == (F,)
    assert np.all(r.mass >= 0)
    assert np.all(r.axes[F:] == 0), "fixed joints must trail"
    # inertia must be symmetric PSD-ish (diagonal dominant not required)
    assert np.allclose(r.inertia, np.swapaxes(r.inertia, 1, 2))


@pytest.mark.parametrize("name", ALL)
def test_zoo_gravity_torque_finite(name):
    """Numeric RNEA at rest must produce finite gravity torques within a
    sane magnitude for every robot."""
    r = zoo.load_zoo_robot(name)
    q = jnp.zeros(r.num_joints, jnp.float64)
    qd = jnp.zeros_like(q)
    tau = rnea_numeric.rnea(r, q, qd, qd, jnp.zeros_like(q))
    tau = np.asarray(tau)
    assert np.all(np.isfinite(tau))
    assert np.max(np.abs(tau)) < 5e3


def test_kinova_urdf_matches_header_model():
    """The URDF-extracted Kinova agrees with the header-derived flagship
    model (KinovaWithoutGripperInfo.h) on kinematics & mass."""
    a = zoo.kinova_urdf()
    b = kinova_gen3()
    assert a.num_factors == b.num_factors == 7
    np.testing.assert_allclose(a.trans[:7], b.trans[:7], atol=2e-3)
    np.testing.assert_allclose(a.mass.sum(), b.mass.sum(), rtol=0.05)


@pytest.mark.parametrize("name", ["fetch_arm", "kuka_iiwa", "panda", "ur5"])
def test_zoo_plan_step_runs(name):
    """A full planning iteration compiles and returns a usable answer on
    each non-flagship robot (tiny configuration for CPU test speed)."""
    r = zoo.load_zoo_robot(name)
    # non-flagship robots keep Kinova-tuned robust-controller constants out
    # of the torque rows (the reference runs Fetch through ARMTD, which has
    # no input constraints; SURVEY.md section 2.1 "ARMTD comparison planner")
    cfg = ArmourConfig.for_robot(
        r,
        num_time_steps=8, dtype=jnp.float64, max_obstacles=2,
        screen_k=128, solver_outer_iters=3, solver_inner_iters=3,
        turn_off_input_constraints=True,
    )
    step = make_planner(r, cfg)
    F = r.num_factors
    # mid-range posture (panda joint 4 admits only [-3.07, -0.07], so a
    # blanket q=0.1 would violate its position limits)
    lo = np.maximum(r.position_limits_lb, -np.pi)
    hi = np.minimum(r.position_limits_ub, np.pi)
    q0 = jnp.asarray((lo + hi) / 2.0 + 0.05, jnp.float64)
    qd0 = jnp.zeros(F, jnp.float64)
    obs = pad_obstacles(
        np.array([[2.5, 2.5, 2.5]]), np.stack([np.diag([0.05] * 3)]),
        cfg.max_obstacles, cfg.dtype,
    )
    res = step(q0, qd0, qd0, q0 + 0.02, obs)
    assert res.cost.shape == ()
    assert np.isfinite(float(res.cost))
    # far-away obstacle, tiny move: the solve should be feasible
    assert bool(res.feasible), f"{name}: expected feasible plan"
    assert np.all(np.isfinite(np.asarray(res.k)))
    assert np.all(np.abs(np.asarray(res.k)) <= 1.0 + 1e-9)
