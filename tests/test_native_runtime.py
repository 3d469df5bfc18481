"""Native C++ runtime (native/armour_rt.cpp) vs the JAX twins.

The native controller is the deployment-side 1 kHz control loop (reference:
kinova_robust_controllers_mex); it must agree with controller.py /
rnea_numeric.py / simulator.py to float64 round-off, since the safety
guarantees (ultimate bound baked into the JRS) are proved for THIS control
law.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from armour_tpu.config import ArmourConfig
from armour_tpu.controller import robust_control
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.rnea_numeric import rnea
from armour_tpu.runtime.native import NativeRuntime
from armour_tpu.simulator import TrueParams, make_rollout


@pytest.fixture(scope="module")
def setup():
    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float64)
    rt = NativeRuntime(robot, cfg)
    return robot, cfg, rt


def test_native_rnea_matches_jax(setup):
    robot, cfg, rt = setup
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.uniform(-2, 2, 7)
        qd = rng.uniform(-1, 1, 7)
        qa = rng.uniform(-1, 1, 7)
        qdd = rng.uniform(-2, 2, 7)
        ref = np.asarray(rnea(robot, jnp.asarray(q), jnp.asarray(qd),
                              jnp.asarray(qa), jnp.asarray(qdd)))
        got = rt.rnea(q, qd, qa, qdd)
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_native_rnea_param_overrides(setup):
    robot, cfg, rt = setup
    rng = np.random.default_rng(4)
    q = rng.uniform(-1, 1, 7)
    qd = rng.uniform(-1, 1, 7)
    mass = robot.mass * (1 + 0.03 * rng.uniform(-1, 1, 7))
    inertia = robot.inertia * (1 + 0.03 * rng.uniform(-1, 1, 7))[:, None, None]
    ref = np.asarray(rnea(robot, jnp.asarray(q), jnp.asarray(qd),
                          jnp.asarray(qd), jnp.zeros(7),
                          mass=jnp.asarray(mass), inertia=jnp.asarray(inertia),
                          set_gravity=True, include_armature=False))
    got = rt.rnea(q, qd, qd, np.zeros(7), mass=mass, inertia=inertia,
                  include_armature=False)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_native_robust_control_matches_jax(setup):
    robot, cfg, rt = setup
    rng = np.random.default_rng(5)
    for _ in range(5):
        q = rng.uniform(-1.5, 1.5, 7)
        q_des = q + rng.uniform(-0.01, 0.01, 7)
        qd = rng.uniform(-0.5, 0.5, 7)
        qd_des = qd + rng.uniform(-0.02, 0.02, 7)
        qdd_des = rng.uniform(-1, 1, 7)
        u_ref, tau_ref, v_ref = robust_control(
            robot, cfg, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(q_des),
            jnp.asarray(qd_des), jnp.asarray(qdd_des))
        u, tau, v = rt.control(q, qd, q_des, qd_des, qdd_des)
        np.testing.assert_allclose(tau, np.asarray(tau_ref), atol=1e-10)
        np.testing.assert_allclose(v, np.asarray(v_ref), atol=1e-10)
        np.testing.assert_allclose(u, np.asarray(u_ref), atol=1e-10)


def test_native_rollout_matches_jax(setup):
    """Closed-loop parity over a short tracking segment: the native rollout
    (ZOH control, per-tick mass matrix, RK4) reproduces simulator.py's
    make_rollout trajectory."""
    from armour_tpu.trajectory import desired_state, initial_plan

    robot, cfg, rt = setup
    rng = np.random.default_rng(6)
    q0 = rng.uniform(-0.5, 0.5, 7)
    qd0 = np.zeros(7)
    tp = TrueParams(
        mass=jnp.asarray(robot.mass * 1.02),
        inertia=jnp.asarray(robot.inertia * 0.98),
        com=jnp.asarray(robot.com),
    )

    control_dt = 1e-3
    rollout = make_rollout(robot, cfg, control_dt=control_dt)
    ref = initial_plan(q0, jnp.float64)
    qj, qdj, logs = rollout(jnp.asarray(q0), jnp.asarray(qd0), ref, tp)

    n = int(round(cfg.t_plan / control_dt))
    ts = np.arange(n) * control_dt
    refs = [np.asarray(jnp.stack(x)) for x in zip(
        *[desired_state(ref, t, cfg) for t in ts])]
    q_log, qd_log, u_log = rt.rollout(
        q0, qd0, refs[0], refs[1], refs[2],
        np.asarray(tp.mass), np.asarray(tp.inertia), dt=control_dt)

    np.testing.assert_allclose(q_log[-1], np.asarray(qj), atol=1e-8)
    np.testing.assert_allclose(qd_log[-1], np.asarray(qdj), atol=1e-8)
    np.testing.assert_allclose(u_log, np.asarray(logs["u"]), atol=1e-7)
