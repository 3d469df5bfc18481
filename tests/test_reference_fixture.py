"""Reference fixtures: the PZ_tests.cu state + slice point, and the
armour.in / armour.out file-format round-trip (VERDICT round-1 item 5).

PZ_tests.cu (kinova_planner_realtime/PZ_tests.cu:19-22,198) runs the CUDA
pipeline on q0 = {0.6543, -0.0876, -0.4837, -1.2278, -1.5735, -1.0720, 0}
and slices every reachable set at k = {0.5, 0.6, 0.7, 0.0, -0.5, -0.6, -0.7}.
We evaluate the same state and slice point, validate the sliced centers
against f64 numeric ground truth (the true trajectory at the sub-interval
midpoint must lie within band radius of the sliced center), and emit the
reference's own dump formats so a future CUDA run can be diffed at <=1e-4
(BASELINE.json criterion).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from armour_tpu import armour_io, bezier, dynamics, kinematics, rnea_numeric
from armour_tpu.config import ArmourConfig
from armour_tpu.jrs import build_jrs
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.pz import basis as basis_mod
from armour_tpu.pz import bpz

ROBOT = kinova_gen3()
N_T = 128  # full reference discretization (Parameters.h:17)
CFG = ArmourConfig(num_time_steps=N_T, dtype=jnp.float64)
BASIS = basis_mod.make_basis(7, 3)

# PZ_tests.cu:19-22 input state; :198 slice point
Q0 = np.array([0.6543, -0.0876, -0.4837, -1.2278, -1.5735, -1.0720, 0.0])
K_SLICE = np.array([0.5, 0.6, 0.7, 0.0, -0.5, -0.6, -0.7])


@pytest.fixture(scope="module")
def sliced():
    import jax

    @jax.jit
    def build(q0, qd0, qdd0):
        jrs = build_jrs(q0, qd0, qdd0, ROBOT, CFG, BASIS)
        links = kinematics.forward_occupancy(jrs, ROBOT, CFG, BASIS)
        frs = kinematics.reduce_links(links, BASIS)
        u_nom = dynamics.rnea_pz(jrs, ROBOT, CFG, BASIS, uncertain=False)
        return jrs, frs, u_nom

    z = jnp.zeros(7, jnp.float64)
    jrs, frs, u_nom = build(jnp.asarray(Q0), z, z)
    phi = BASIS.phi(jnp.asarray(K_SLICE))
    return jrs, frs, u_nom, phi


def test_pz_tests_fixture_containment(sliced):
    """At the PZ_tests.cu state/slice, the true qd/torque/link centers at each
    sub-interval midpoint lie within the sliced bands (debug_script.m:98-123
    criterion, evaluated at the canonical fixture)."""
    jrs, frs, u_nom, phi = sliced
    k_act = K_SLICE * np.asarray(CFG.k_range)
    Tqd0 = np.zeros(7)
    TTqdd0 = np.zeros(7)
    for t_ind in (0, 31, 64, 127):
        s = (t_ind + 0.5) / N_T
        q = np.asarray(bezier.q_des(Q0, Tqd0, TTqdd0, k_act, s))
        qd = np.asarray(bezier.qd_des(Q0, Tqd0, TTqdd0, k_act, s))
        qdd = np.asarray(bezier.qdd_des(Q0, Tqd0, TTqdd0, k_act, s))

        pz = bpz.BPZ(jrs.qd.coef[t_ind], jrs.qd.egen[t_ind], jrs.qd.rad[t_ind])
        c, r = bpz.slice_at(pz, phi)
        assert np.all(np.abs(qd - np.asarray(c)) <= np.asarray(r) + 1e-12)

        tau = np.asarray(rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd), jnp.asarray(qdd)))
        pz = bpz.BPZ(u_nom.coef[t_ind], u_nom.egen[t_ind], u_nom.rad[t_ind])
        c, r = bpz.slice_at(pz, phi)
        assert np.all(np.abs(tau - np.asarray(c)) <= np.asarray(r) + 1e-10)

        _, _, centers = rnea_numeric.forward_kinematics(ROBOT, jnp.asarray(q))
        c = np.einsum("jab,b->ja", np.asarray(frs.center_coef[t_ind]), np.asarray(phi))
        hull = (np.sum(np.abs(np.asarray(frs.shape_gens[t_ind])), axis=-1)
                + np.asarray(frs.radius[t_ind]))
        assert np.all(np.abs(np.asarray(centers) - c) <= hull + 1e-12)


def test_armour_in_out_roundtrip(tmp_path):
    """armour.in / armour.out byte-format round-trip (armour_main.cu:40-80,
    314-325): parse(write(x)) == x."""
    rng = np.random.default_rng(0)
    gens = np.zeros((3, 3, 3))
    for i in range(3):
        gens[i] = np.diag(rng.uniform(0.01, 0.3, 3))
    data = armour_io.ArmourIn(
        q0=rng.uniform(-1, 1, 7), qd0=rng.uniform(-1, 1, 7),
        qdd0=rng.uniform(-1, 1, 7), q_des=rng.uniform(-1, 1, 7),
        centers=rng.uniform(-1, 1, (3, 3)), generators=gens,
    )
    p = str(tmp_path / "armour.in")
    armour_io.write_armour_in(p, data)
    back = armour_io.read_armour_in(p)
    for f in ("q0", "qd0", "qdd0", "q_des", "centers", "generators"):
        np.testing.assert_allclose(getattr(back, f), getattr(data, f), atol=1e-9)

    po = str(tmp_path / "armour.out")
    armour_io.write_armour_out(po, np.array([0.1, -0.2, 0.3, 0, 0.5, -0.6, 0.7]), 123.4)
    k, ms = armour_io.read_armour_out(po)
    np.testing.assert_allclose(k, [0.1, -0.2, 0.3, 0, 0.5, -0.6, 0.7])
    assert ms == pytest.approx(123.4)
    armour_io.write_armour_out(po, None, 55.0)
    k, ms = armour_io.read_armour_out(po)
    assert k is None and ms == pytest.approx(55.0)


def test_plan_from_armour_in_writes_reference_dumps(tmp_path):
    """End-to-end file-protocol drive: armour.in -> planner -> armour.out +
    FRS dumps in the reference's exact layouts (armour_main.cu:305-372)."""
    cfg = ArmourConfig(num_time_steps=8, dtype=jnp.float64, max_obstacles=4,
                       screen_k=256, solver_outer_iters=3, solver_inner_iters=3)
    # >=2 obstacles so the file ORDER of the collision block is pinned, not
    # just its values (the round-4 single-obstacle test missed a time-major/
    # link-major transposition)
    data = armour_io.ArmourIn(
        q0=Q0, qd0=np.zeros(7), qdd0=np.zeros(7), q_des=Q0 + 0.02,
        centers=np.array([[2.5, 2.5, 2.5], [-2.0, 2.0, 1.5]]),
        generators=np.stack([np.diag([0.05, 0.05, 0.05]),
                             np.diag([0.08, 0.04, 0.06])]),
    )
    in_path = str(tmp_path / "armour.in")
    armour_io.write_armour_in(in_path, data)
    out = armour_io.plan_from_armour_in(in_path, str(tmp_path), ROBOT, cfg)
    assert out["feasible"]

    k, ms = armour_io.read_armour_out(str(tmp_path / "armour.out"))
    np.testing.assert_allclose(k, out["k"], atol=1e-9)

    centers = np.loadtxt(str(tmp_path / "armour_joint_position_center.out"))
    assert centers.shape == (8 * ROBOT.num_joints, 3)
    radii = np.loadtxt(str(tmp_path / "armour_joint_position_radius.out"))
    assert radii.shape == (8 * ROBOT.num_joints * 3, 6)
    tr = np.loadtxt(str(tmp_path / "armour_control_input_radius.out"))
    assert tr.shape == (8, 7)

    # 4th dump (armour_main.cu:366-371): one constraint value per line —
    # T*F torque + J*T*n_obs collision + 4*F state-extremum rows
    n_obs = 2
    g = np.loadtxt(str(tmp_path / "armour_constraints.out"))
    assert g.shape == (8 * 7 + ROBOT.num_joints * 8 * n_obs + 4 * 7,)
    # pin the exact reference POSITIONS of every block, not just values:
    # torque time-major t*F+j (NLPclass.cu:308), collision link-major
    # (link*T + t)*O + o (CollisionChecking.cu:128, NLPclass.cu:475),
    # state rows last
    n_t = 8 * 7
    np.testing.assert_allclose(g[:n_t], out["constraint_torque"].reshape(-1),
                               rtol=0, atol=1e-5)
    n_c = ROBOT.num_joints * 8 * n_obs
    np.testing.assert_allclose(
        g[n_t:n_t + n_c],
        np.transpose(out["constraint_collision"], (1, 0, 2)).reshape(-1),
        rtol=0, atol=1e-5)
    np.testing.assert_allclose(g[n_t + n_c:], out["constraint_state"],
                               rtol=0, atol=1e-5)
    # the accepted plan's collision rows are all safe (<= 0) and torque rows
    # within limits
    assert np.all(g[n_t:n_t + n_c] <= 1e-4)
    assert np.all(np.abs(g[:n_t]) <= ROBOT.torque_limits.max())
