"""JRS -> FK -> RNEA reachable-set validation (SURVEY.md section 4, levels
i-ii): oracle cross-checks and Monte-Carlo containment of numeric ground
truth inside sliced PZ bands (the debug_script.m analog)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from armour_tpu import bezier, dynamics, kinematics, rnea_numeric
from armour_tpu.config import ArmourConfig
from armour_tpu.jrs import build_jrs
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.pz import basis as basis_mod
from armour_tpu.pz import bpz
from armour_tpu.pz.oracle_pipeline import jrs_to_oracle, oracle_fk, oracle_rnea

ROBOT = kinova_gen3()
CFG = ArmourConfig(num_time_steps=16, dtype=jnp.float64)
BASIS = basis_mod.make_basis(7, 3)

Q0 = np.array([0.6543, -0.0876, -0.4837, -1.2278, -1.5735, -1.0720, 0.0])
QD0 = np.array([0.1, -0.2, 0.15, 0.3, -0.1, 0.05, 0.2])
QDD0 = np.array([0.3, 0.1, -0.2, 0.1, 0.2, -0.1, 0.0])


@pytest.fixture(scope="module")
def jrs():
    return build_jrs(Q0, QD0, QDD0, ROBOT, CFG, BASIS)


@pytest.fixture(scope="module")
def links(jrs):
    return kinematics.forward_occupancy(jrs, ROBOT, CFG, BASIS)


def _sample_traj(rng, t_ind):
    """Random (s, k) with s inside sub-interval t_ind; returns q, qd, qdd."""
    ds = 1.0 / CFG.num_time_steps
    s = rng.uniform(t_ind * ds, (t_ind + 1) * ds)
    k = rng.uniform(-1, 1, 7)
    k_act = k * np.asarray(CFG.k_range)
    Tqd0 = QD0 * CFG.duration
    TTqdd0 = QDD0 * CFG.duration**2
    q = bezier.q_des(Q0, Tqd0, TTqdd0, k_act, s)
    qd = bezier.qd_des(Q0, Tqd0, TTqdd0, k_act, s) / CFG.duration
    qdd = bezier.qdd_des(Q0, Tqd0, TTqdd0, k_act, s) / CFG.duration**2
    return np.asarray(q), np.asarray(qd), np.asarray(qdd), k


def test_jrs_velocity_acceleration_containment(jrs):
    rng = np.random.default_rng(1)
    for _ in range(100):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        phi = BASIS.phi(jnp.asarray(k))
        for arr, truth in ((jrs.qd, qd), (jrs.qdda, qdd)):
            pz = bpz.BPZ(arr.coef[t_ind], arr.egen[t_ind], arr.rad[t_ind])
            c, r = bpz.slice_at(pz, phi)
            assert np.all(np.abs(truth - np.asarray(c)) <= np.asarray(r) + 1e-12), (
                t_ind, truth, np.asarray(c), np.asarray(r))


def test_jrs_rotation_containment(jrs):
    """cos/sin of the true trajectory must lie inside the rotation PZ."""
    rng = np.random.default_rng(2)
    for _ in range(50):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        phi = BASIS.phi(jnp.asarray(k))
        R_true = rnea_numeric.joint_rotations(ROBOT, jnp.asarray(q))
        for i in range(7):
            pz = bpz.BPZ(jrs.R.coef[t_ind, i], jrs.R.egen[t_ind, i], jrs.R.rad[t_ind, i])
            c, r = bpz.slice_at(pz, phi)
            assert np.all(
                np.abs(np.asarray(R_true[i]) - np.asarray(c)) <= np.asarray(r) + 1e-12
            )


def test_fk_matches_oracle(jrs, links):
    """Dense FK == sparse-oracle FK: k-poly coefficients exact, radii
    conservative and tight."""
    for t in (0, CFG.num_time_steps // 2, CFG.num_time_steps - 1):
        oj = jrs_to_oracle(jrs, ROBOT, BASIS, t)
        olinks = oracle_fk(oj, ROBOT, threshold=0.0)
        for i in (0, 3, 6):
            ref = olinks[i]
            # k-only coefficients with total degree <= 3 match exactly
            got_coef = np.asarray(links.coef[t, i])  # [3, B]
            ref_coef = np.zeros_like(got_coef)
            ref_coef[:, 0] = ref.center
            for key, v in ref.k_poly().items():
                d = [0] * 7
                for (g, j), e in key:
                    d[j] = e
                if sum(d) <= 3:
                    ref_coef[:, BASIS.index[tuple(d)]] += v
            np.testing.assert_allclose(got_coef, ref_coef, atol=1e-11)
            # interval hull: conservative but within 5% + tiny abs slack
            oc, orad = ref.to_interval()
            dc, drad = bpz.to_interval(
                bpz.BPZ(links.coef[t, i], links.egen[t, i], links.rad[t, i])
            )
            assert np.all(np.asarray(drad) >= orad - 1e-11)
            assert np.all(np.asarray(drad) <= orad * 1.05 + 1e-3), (
                np.asarray(drad), orad)


def test_fk_numeric_containment(links):
    """True link centers along the trajectory lie inside the link FRS hull."""
    rng = np.random.default_rng(3)
    frs = kinematics.reduce_links(links, BASIS)
    for _ in range(100):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        _, _, centers = rnea_numeric.forward_kinematics(ROBOT, jnp.asarray(q))
        phi = BASIS.phi(jnp.asarray(k))
        c = np.einsum("jab,b->ja", np.asarray(frs.center_coef[t_ind]), np.asarray(phi))
        hull = np.sum(np.abs(np.asarray(frs.shape_gens[t_ind])), axis=-1) + np.asarray(
            frs.radius[t_ind]
        )
        assert np.all(np.abs(np.asarray(centers) - c) <= hull + 1e-12)


def test_rnea_numeric_containment(jrs):
    """Numeric passivity RNEA torque along the trajectory lies inside the
    sliced nominal torque band (debug_script.m:98-123 analog)."""
    u_nom = dynamics.rnea_pz(jrs, ROBOT, CFG, BASIS, uncertain=False)
    rng = np.random.default_rng(4)
    for _ in range(60):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        tau = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd), jnp.asarray(qdd)
        )
        phi = BASIS.phi(jnp.asarray(k))
        pz = bpz.BPZ(u_nom.coef[t_ind], u_nom.egen[t_ind], u_nom.rad[t_ind])
        c, r = bpz.slice_at(pz, phi)
        assert np.all(np.abs(np.asarray(tau) - np.asarray(c)) <= np.asarray(r) + 1e-10), (
            t_ind, np.asarray(tau) - np.asarray(c), np.asarray(r))


def test_rnea_interval_contains_perturbed_params(jrs):
    """Interval RNEA must cover torques under +-3% mass/inertia."""
    u_int = dynamics.rnea_pz(jrs, ROBOT, CFG, BASIS, uncertain=True)
    rng = np.random.default_rng(5)
    for _ in range(30):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        dm = 1.0 + rng.uniform(-1, 1, 7) * ROBOT.mass_uncertainty
        dI = 1.0 + rng.uniform(-1, 1, (7, 1, 1)) * ROBOT.inertia_uncertainty
        tau = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd), jnp.asarray(qdd),
            mass=ROBOT.mass * dm, inertia=ROBOT.inertia * dI,
        )
        phi = BASIS.phi(jnp.asarray(k))
        pz = bpz.BPZ(u_int.coef[t_ind], u_int.egen[t_ind], u_int.rad[t_ind])
        c, r = bpz.slice_at(pz, phi)
        assert np.all(np.abs(np.asarray(tau) - np.asarray(c)) <= np.asarray(r) + 1e-10)


def test_rnea_interval_contains_com_uncertainty(jrs):
    """With com_uncertainty enabled, the interval RNEA must also cover
    torques under perturbed centers of mass (get_inertial_params.m:212
    semantics: whole COM vector scaled by one factor per link)."""
    robot_c = dataclasses.replace(ROBOT, com_uncertainty=0.05)
    u_int = dynamics.rnea_pz(jrs, robot_c, CFG, BASIS, uncertain=True)
    rng = np.random.default_rng(9)
    for _ in range(20):
        t_ind = int(rng.integers(0, CFG.num_time_steps))
        q, qd, qdd, k = _sample_traj(rng, t_ind)
        dm = 1.0 + rng.uniform(-1, 1, 7) * robot_c.mass_uncertainty
        dI = 1.0 + rng.uniform(-1, 1, (7, 1, 1)) * robot_c.inertia_uncertainty
        dc = 1.0 + rng.uniform(-1, 1, (7, 1)) * robot_c.com_uncertainty
        tau = rnea_numeric.rnea(
            ROBOT, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qd), jnp.asarray(qdd),
            mass=ROBOT.mass * dm, inertia=ROBOT.inertia * dI, com=ROBOT.com * dc,
        )
        phi = BASIS.phi(jnp.asarray(k))
        pz = bpz.BPZ(u_int.coef[t_ind], u_int.egen[t_ind], u_int.rad[t_ind])
        c, r = bpz.slice_at(pz, phi)
        assert np.all(np.abs(np.asarray(tau) - np.asarray(c)) <= np.asarray(r) + 1e-10)


def test_rnea_close_to_faithful_oracle(jrs):
    """BPZ RNEA vs the sparse monomial-list oracle at a near-exact pruning
    threshold (1e-5): the two implementations track completely different
    representations (dense static k-basis + outward rounding vs sparse
    per-variable-group monomials), so tight agreement here pins BOTH.

    Measured on this fixture: worst sliced-center difference 2.4e-5, worst
    radius ratio 1.096 — asserted at 4x those (1e-4 / 1.2x, the VERDICT
    round-2 item-9 target).  The center difference is bounded by the pruned
    coefficient mass (threshold * n_monomials), NOT by numerics: at
    threshold=0 the sparse lists blow up combinatorially, so 1e-5 is the
    practical exactness floor."""
    t = CFG.num_time_steps // 2
    oj = jrs_to_oracle(jrs, ROBOT, BASIS, t)
    otau = oracle_rnea(oj, ROBOT, uncertain=False, threshold=1e-5)
    u_nom = dynamics.rnea_pz(jrs, ROBOT, CFG, BASIS, uncertain=False)
    rng = np.random.default_rng(6)
    for _ in range(5):
        k = rng.uniform(-1, 1, 7)
        phi = BASIS.phi(jnp.asarray(k))
        for i in range(7):
            oc, orad = otau[i].slice_at(k)
            pz = bpz.BPZ(u_nom.coef[t, i], u_nom.egen[t, i], u_nom.rad[t, i])
            dc, drad = bpz.slice_at(pz, phi)
            assert abs(float(dc) - float(oc)) <= 1e-4, (i, float(dc), float(oc))
            # dense-basis outward rounding may only ADD conservatism, and at
            # most 20% of it on this pipeline
            assert float(drad) <= 1.2 * float(orad) + 1e-6, (i, float(drad), float(orad))
