"""ARMTD comparison planner: JRS containment along the constant-acceleration
trajectory and a feasible end-to-end solve."""

import numpy as np
import jax
import jax.numpy as jnp

from armour_tpu import armtd
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.pz import bpz
from armour_tpu.pz.basis import make_basis

ROBOT = kinova_gen3()
CFG = ArmourConfig(num_time_steps=16, dtype=jnp.float64, max_obstacles=4)
BASIS = make_basis(7, 3)

Q0 = np.array([0.3, -0.2, 0.4, -1.0, 0.2, -0.5, 0.1])
QD0 = np.array([0.3, -0.4, 0.2, 0.5, -0.3, 0.1, 0.4])


def _traj(k_act, t):
    tp, ts = CFG.t_plan, CFG.duration
    qd_pk = QD0 + k_act * tp
    brk = -qd_pk / (ts - tp)
    if t <= tp:
        q = Q0 + QD0 * t + 0.5 * k_act * t * t
        qd = QD0 + k_act * t
        qdd = k_act
    else:
        tau = t - tp
        q_pk = Q0 + QD0 * tp + 0.5 * k_act * tp * tp
        q = q_pk + qd_pk * tau + 0.5 * brk * tau * tau
        qd = qd_pk + brk * tau
        qdd = brk
    return q, qd, qdd


def test_armtd_jrs_containment():
    jrs = armtd.build_jrs_armtd(Q0, QD0, ROBOT, CFG, BASIS)
    gk = np.asarray(armtd.g_k_adaptive(jnp.asarray(QD0)))
    rng = np.random.default_rng(0)
    step = CFG.duration / CFG.num_time_steps
    for _ in range(100):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        t = rng.uniform(t_ind * step, (t_ind + 1) * step)
        k = rng.uniform(-1, 1, 7)
        q, qd, qdd = _traj(k * gk, t)
        phi = BASIS.phi(jnp.asarray(k))
        for arr, truth in ((jrs.qd, qd), (jrs.qdda, qdd)):
            pz = bpz.BPZ(arr.coef[t_ind], arr.egen[t_ind], arr.rad[t_ind])
            c, r = bpz.slice_at(pz, phi)
            assert np.all(np.abs(truth - np.asarray(c)) <= np.asarray(r) + 1e-12), (
                t_ind, t, truth - np.asarray(c), np.asarray(r))
        # rotation containment via cos/sin of q
        pz = bpz.BPZ(jrs.R.coef[t_ind, 0], jrs.R.egen[t_ind, 0], jrs.R.rad[t_ind, 0])
        c, r = bpz.slice_at(pz, phi)
        R_true = ROBOT.rot_mats[0] @ np.array(
            [[np.cos(q[0]), -np.sin(q[0]), 0], [np.sin(q[0]), np.cos(q[0]), 0], [0, 0, 1]]
        )
        assert np.all(np.abs(R_true - np.asarray(c)) <= np.asarray(r) + 1e-12)


def test_armtd_plan_feasible():
    obs = pad_obstacles(
        np.array([[0.7, 0.7, 0.5]]), np.diag([0.05] * 3)[None],
        CFG.max_obstacles, CFG.dtype,
    )
    step = jax.jit(
        lambda a, b, d, o: armtd.plan_step_armtd(a, b, d, o, ROBOT, CFG, BASIS)
    )
    q0 = jnp.asarray(Q0)
    qd0 = jnp.asarray(QD0) * 0.2
    res = step(q0, qd0, q0 + 0.05, obs)
    assert bool(res.feasible)
    assert np.all(np.isfinite(np.asarray(res.k)))


def test_armtd_closed_loop_reaches_goal():
    """Full closed-loop trial with the constant-acceleration family: the
    cfg.traj_family switch drives planner + reference tracking + braking
    (armtd_main.cu + uarmtd_planner.m 'orig' branch semantics)."""
    import numpy as np

    from armour_tpu.planner import make_planner
    from armour_tpu.simulator import run_trial, sample_true_params
    from armour_tpu.worlds import World

    cfg = ArmourConfig(num_time_steps=16, dtype=jnp.float64, max_obstacles=4,
                       screen_k=256, traj_family="armtd")
    start = np.zeros(7)
    w = World(start=start, goal=start + 0.35,
              obstacle_centers=np.array([[2.5, 2.5, 2.5]]),
              obstacle_generators=np.diag([0.05] * 3)[None])
    obs = pad_obstacles(w.obstacle_centers, w.obstacle_generators,
                        cfg.max_obstacles, cfg.dtype)
    tp = sample_true_params(ROBOT, np.random.default_rng(0), scale=1.0)
    s = run_trial(w, ROBOT, cfg, make_planner(ROBOT, cfg), obs, tp,
                  max_iterations=40)
    assert s.goal_reached and not s.collision and not s.torque_exceeded
    assert not s.ultimate_bound_exceeded and not s.joint_limit_exceeded
