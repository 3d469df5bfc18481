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


@pytest.mark.parametrize("name", ALL)
def test_zoo_mass_matrix_positive_definite(name):
    """M(q) must be symmetric positive definite for every zoo robot — catches
    sign errors in the axis projection (KUKA iiwa uses negative axis codes)."""
    r = zoo.load_zoo_robot(name)
    rng = np.random.default_rng(3)
    lo = np.maximum(r.position_limits_lb, -np.pi)
    hi = np.minimum(r.position_limits_ub, np.pi)
    for _ in range(3):
        q = jnp.asarray(rng.uniform(lo, hi), jnp.float64)
        M = np.asarray(rnea_numeric.mass_matrix(r, q))
        np.testing.assert_allclose(M, M.T, atol=1e-8)
        eig = np.linalg.eigvalsh(M)
        assert np.all(eig > 0), f"{name}: M(q) not PD, eigs={eig}"


def test_kuka_numeric_rnea_matches_pz_center():
    """Numeric RNEA must agree with the PZ-RNEA center at the JRS center
    state for a robot with negative axis codes (advisor round-1 finding)."""
    from armour_tpu.dynamics import rnea_pz
    from armour_tpu.jrs import build_jrs
    from armour_tpu.pz.basis import make_basis

    r = zoo.load_zoo_robot("kuka_iiwa")
    assert np.any(r.axes < 0), "kuka fixture must exercise negative axes"
    F = r.num_factors
    cfg = ArmourConfig.for_robot(r, num_time_steps=4, dtype=jnp.float64)
    basis = make_basis(F, cfg.max_poly_degree)
    q0 = jnp.asarray(np.linspace(-0.3, 0.3, F), jnp.float64)
    qd0 = jnp.zeros(F, jnp.float64)
    jrs = build_jrs(q0, qd0, qd0, r, cfg, basis)
    u = rnea_pz(jrs, r, cfg, basis, uncertain=False)
    # k = 0 slice center of the first time step vs numeric RNEA at the
    # matching desired state
    from armour_tpu.trajectory import desired_state, initial_plan, advance_plan

    ref = advance_plan(initial_plan(q0, jnp.float64), jnp.zeros(F, jnp.float64),
                       q0, qd0, qd0, cfg)
    t_mid = 0.5 * cfg.duration / cfg.num_time_steps
    q_d, qd_d, qdd_d = desired_state(ref, t_mid, cfg)
    tau = np.asarray(rnea_numeric.rnea(r, q_d, qd_d, qd_d, qdd_d))
    c0 = np.asarray(u.coef[0, :, 0])
    rad = np.asarray(u.rad[0]) + np.sum(np.abs(np.asarray(u.egen[0])), axis=-1) \
        + np.sum(np.abs(np.asarray(u.coef[0, :, 1:])), axis=-1)
    assert np.all(np.abs(tau - c0) <= rad + 1e-6), (
        f"numeric torque outside PZ band: tau={tau}, c0={c0}, rad={rad}")


def test_derived_ultimate_bound_brackets_sampled_eigenvalues():
    """derive_ultimate_bound must produce a valid eigenvalue bracket: m_min
    below and m_max above every sampled M(q) eigenvalue (the reference
    hardcodes Kinova-only constants, KinovaWithoutGripperInfo.h:103-112;
    derived ones extend the guarantee to the zoo robots)."""
    from armour_tpu.config import derive_ultimate_bound

    rng = np.random.default_rng(11)
    for name in ["kinova_urdf", "kuka_iiwa"]:
        r = zoo.load_zoo_robot(name) if name != "kinova_urdf" else kinova_gen3()
        ub = derive_ultimate_bound(r)
        lo = np.maximum(r.position_limits_lb, -np.pi)
        hi = np.minimum(r.position_limits_ub, np.pi)
        qs = rng.uniform(lo, hi, (64, r.num_factors))
        M = np.asarray(rnea_numeric.mass_matrix(r, jnp.asarray(qs, jnp.float64)))
        eigs = np.linalg.eigvalsh(M)
        assert 0.0 < ub.m_min <= eigs.min(), (name, ub.m_min, eigs.min())
        assert ub.m_max >= eigs.max(), (name, ub.m_max, eigs.max())


def test_certified_m_min_below_sampled_everywhere():
    """certify.certified_m_min is a SOUND lower bound: certified <= the raw
    sampled minimum eigenvalue for every zoo robot (VERDICT r3 #4).  For the
    Kinova, the certified eps must be at least as tight as 1.2x the
    reference's hardcoded value (ours is TIGHTER: armature Weyl bound 8.03
    beats the reference's 5.0956, so eps drops from 0.0627 to 0.0499 while
    remaining sound)."""
    import math

    from armour_tpu.certify import certified_m_min

    rng = np.random.default_rng(5)
    for name in ALL:
        r = kinova_gen3() if name == "kinova_urdf" else zoo.load_zoo_robot(name)
        cert = certified_m_min(r, max_boxes=60)
        lo = np.maximum(r.position_limits_lb, -np.pi)
        hi = np.minimum(r.position_limits_ub, np.pi)
        qs = rng.uniform(lo, hi, (32, r.num_factors))
        M = np.asarray(rnea_numeric.mass_matrix(r, jnp.asarray(qs, jnp.float64)))
        sampled_min = float(np.linalg.eigvalsh(M)[..., 0].min())
        assert 0.0 <= cert <= sampled_min + 1e-9, (name, cert, sampled_min)

    kin = kinova_gen3()
    cert = certified_m_min(kin)
    assert cert >= 8.0, cert           # armature Weyl bound
    eps = math.sqrt(2.0 * 1e-2 / cert)
    assert eps <= 1.2 * 0.0627, eps    # at least as tight as the reference


def test_interval_mass_matrix_contains_samples():
    """The interval enclosure of M_links over a box contains every sampled
    M_links(q) for q in the box (the soundness invariant the B&B rests on)."""
    from armour_tpu.certify import interval_link_mass_matrix

    r = kinova_gen3()
    rng = np.random.default_rng(7)
    qc = rng.uniform(-1.5, 1.5, r.num_factors)
    for w in (0.0, 0.05, 0.3):
        qlo, qhi = qc - w, qc + w
        Mlo, Mhi = interval_link_mass_matrix(r, qlo[None], qhi[None])
        qs = rng.uniform(qlo, qhi, (24, r.num_factors))
        Ms = np.asarray(rnea_numeric.mass_matrix(
            r, jnp.asarray(qs, jnp.float64), include_armature=False))
        assert np.all(Ms >= Mlo - 1e-9), w
        assert np.all(Ms <= Mhi + 1e-9), w


@pytest.mark.parametrize("name", ALL)
def test_derived_ultimate_bound_leaves_velocity_headroom(name):
    """The co-derived eps must keep the velocity tracking budget qde = 2*eps
    strictly below every robot's speed limit, or the planner's velocity
    extremum constraints (nlp.py vel_ub = speed_limits - qde) are infeasible
    for every k (round-2 regression: fixed V_max=1e-2 gave the Panda
    eps = 5.5 rad, qde = 11 rad/s > its 2.2 rad/s limit)."""
    from armour_tpu.config import derive_ultimate_bound

    r = zoo.load_zoo_robot(name)
    ub = derive_ultimate_bound(r)
    min_speed = float(np.min(r.speed_limits))
    assert ub.qde < min_speed, (name, ub.qde, min_speed)
    # and with real headroom: at most half the speed budget eaten by tracking
    assert ub.qde <= 0.5 * min_speed + 1e-9, (name, ub.qde, min_speed)


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


def _ref_urdf_text(name):
    """URDF text of a zoo robot from the reference tree, with the same
    fixups the extraction script applies."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "_xzoo", Path(__file__).resolve().parents[1] / "scripts" /
        "extract_robot_zoo.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._read(mod.ZOO[name]), str(mod.ZOO[name].parent)


def _chain_link_names(urdf_text):
    """Child-link name per chain joint, in the same order load_urdf builds
    the chain (so zoo_data boxes can be matched to mesh links by index)."""
    import io
    import xml.etree.ElementTree as ET

    root = ET.parse(io.StringIO(urdf_text)).getroot()
    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))
    child_of = {j.find("child").get("link"): j for j in joints}
    by_parent = {j.find("parent").get("link"): j for j in joints}
    base = next(l for l in links if l not in child_of)
    chain, cur = [], base
    while cur in by_parent:
        j = by_parent[cur]
        cur = j.find("child").get("link")
        chain.append(cur)

    def has_inertia(lname):
        inr = links[lname].find("inertial")
        return inr is not None and inr.find("mass") is not None

    while chain and child_of[chain[-1]].get("type") == "fixed" \
            and not has_inertia(chain[-1]):
        chain.pop()
    return chain


@pytest.mark.parametrize("name", ["fetch_arm", "kuka_iiwa", "panda", "ur5"])
def test_zoo_mesh_boxes_contain_fk_meshes(name):
    """VERDICT r4 #8 acceptance: the zoo robots' link boxes are mesh-derived
    and, at random configurations, every (subsampled) mesh vertex pushed
    through FK lies inside the oracle's world-frame OBB for its link
    (create_pz_bounding_boxes.m parity, uarmtd_agent.m:60)."""
    import io

    from armour_tpu.models.mesh import link_point_clouds

    text, mesh_dir = _ref_urdf_text(name)
    clouds = link_point_clouds(io.StringIO(text), mesh_dir=mesh_dir)
    chain = _chain_link_names(text)
    r = zoo.load_zoo_robot(name)
    assert len(chain) == r.num_joints
    covered = [i for i, ln in enumerate(chain) if ln in clouds]
    # the claimed improvement: (nearly) every chain link is mesh-derived now
    assert len(covered) >= r.num_joints - 1, (name, chain, list(clouds))

    rng = np.random.default_rng(13)
    lo = np.maximum(r.position_limits_lb, -np.pi)
    hi = np.minimum(r.position_limits_ub, np.pi)
    for _ in range(2):
        q = jnp.asarray(rng.uniform(lo, hi), jnp.float64)
        R_w, p_w, centers = rnea_numeric.forward_kinematics(r, q)
        R_w, p_w, centers = map(np.asarray, (R_w, p_w, centers))
        for i in covered:
            v = clouds[chain[i]]
            if len(v) > 2000:
                v = v[rng.choice(len(v), 2000, replace=False)]
            vw = v @ R_w[i].T + p_w[i]
            local = (vw - centers[i]) @ R_w[i]     # back to link axes
            assert np.all(np.abs(local) <= r.link_generators[i] + 1e-6), (
                name, i, chain[i],
                np.max(np.abs(local) - r.link_generators[i]))


def test_certified_bound_is_used_for_suite_robots():
    """VERDICT r4 #5 acceptance: every robot the committed suites run (the
    Kinova flagship + its URDF/dumbbell variants) derives eps from the
    CERTIFIED m_min, recorded as such in ub_cache.json; every other zoo
    robot carries an explicit waiver with quantitative flatness evidence.

    (The round-4 ask listed the kuka among the certified set; measured
    reality: with zero URDF armature its true lambda_min(M) ~ 2.3e-3 is
    wrist-dominated and flat, the interval B&B certifies 0, and no sound
    positive bound is reachable without inventing motor constants — so the
    kuka is in the waived set, with the sampled bound's low variance
    demonstrated instead.)"""
    import json
    from pathlib import Path

    from armour_tpu.config import derive_ultimate_bound

    cache = json.loads((Path(zoo.__file__).parent / "ub_cache.json").read_text())
    by_name = {k.split("|")[0]: v for k, v in cache.items()}

    for name in ["kinova_gen3_7dof", "kinova_urdf", "kinova_dumbbell"]:
        entry = by_name[name]
        assert entry["provenance"]["certified"], name
        assert entry["m_min"] >= 8.0, (name, entry["m_min"])

    for name in ["fetch_arm", "kuka_iiwa", "panda", "ur5"]:
        prov = by_name[name]["provenance"]
        assert not prov["certified"], name
        assert "waiver" in prov and "flatness" in prov, name
        fl = prov["flatness"]
        # flatness evidence: the 5th percentile of sampled lambda_min sits
        # within 3x of the sampled minimum -> low sampling variance
        assert fl["sampled_p05"] <= 3.0 * fl["sampled_min"], (name, fl)

    # the derivation itself reports certified=True for the flagship
    ub, prov = derive_ultimate_bound(kinova_gen3(), return_provenance=True)
    assert prov["certified"] and ub.m_min >= 8.0


def test_certified_m_max_above_sampled_and_tight_for_flagship():
    """certified_m_max is a sound upper bound (>= every sampled
    lambda_max(M)) and, after the per-joint distance refinement (r4 weak
    #7: the old chain-length bound gave 46.1), sits within 25% of the
    sampled bracket for the flagship."""
    from armour_tpu.certify import certified_m_max

    rng = np.random.default_rng(17)
    for name in ["kinova_urdf", "kuka_iiwa", "panda"]:
        r = kinova_gen3() if name == "kinova_urdf" else zoo.load_zoo_robot(name)
        cert = certified_m_max(r)
        lo = np.maximum(r.position_limits_lb, -np.pi)
        hi = np.minimum(r.position_limits_ub, np.pi)
        qs = rng.uniform(lo, hi, (48, r.num_factors))
        M = np.asarray(rnea_numeric.mass_matrix(r, jnp.asarray(qs, jnp.float64)))
        sampled_max = float(np.linalg.eigvalsh(M)[..., -1].max())
        assert cert >= sampled_max - 1e-9, (name, cert, sampled_max)

    kin = kinova_gen3()
    assert certified_m_max(kin) <= 1.25 * 15.02, certified_m_max(kin)
