"""Batched closed loop vs serial run_trial: per-world outcomes must agree
(VERDICT round-1 item 6 — the 100-world suite runs in lockstep on one chip)."""

import numpy as np
import jax.numpy as jnp

from armour_tpu.batch_sim import run_trials_batched
from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner
from armour_tpu.simulator import run_trial, sample_true_params
from armour_tpu.worlds import World

ROBOT = kinova_gen3()
CFG = ArmourConfig(num_time_steps=16, dtype=jnp.float64, max_obstacles=4,
                   screen_k=512, solver_outer_iters=4, solver_inner_iters=4)

Q0 = np.array([0.0, -0.3, 0.0, -1.2, 0.0, -0.8, 0.0])


def _worlds():
    far = np.array([[0.9, 0.9, 0.5]])
    g = np.diag([0.05, 0.05, 0.05])[None]
    return [
        World(start=Q0, goal=Q0 + 0.1, obstacle_centers=far, obstacle_generators=g),
        World(start=Q0 + 0.05, goal=Q0 - 0.08, obstacle_centers=far + 0.2,
              obstacle_generators=g),
    ]


def test_batched_matches_serial():
    worlds = _worlds()
    batched = run_trials_batched(worlds, ROBOT, CFG, max_iterations=6,
                                 true_param_scale=1.0, seed=0, use_hlp=True)

    step = make_planner(ROBOT, CFG)
    rng = np.random.default_rng(0)
    for i, (w, b) in enumerate(zip(worlds, batched)):
        obs = pad_obstacles(w.obstacle_centers, w.obstacle_generators,
                            CFG.max_obstacles, CFG.dtype)
        tp = sample_true_params(ROBOT, rng, scale=1.0)
        # the batched path guides with the EE RRT* HLP (seed=seed+i); the
        # serial trial must use the identical generator for parity
        from armour_tpu.hlp import EndEffectorRRTStarHLP

        hlp = EndEffectorRRTStarHLP(w, ROBOT, lookahead=0.1, seed=i)
        s = run_trial(w, ROBOT, CFG, step, obs, tp, max_iterations=6, hlp=hlp)
        assert b.goal_reached == s.goal_reached, (b, s)
        assert b.collision == s.collision
        assert b.torque_exceeded == s.torque_exceeded
        assert b.ultimate_bound_exceeded == s.ultimate_bound_exceeded
        assert b.joint_limit_exceeded == s.joint_limit_exceeded
        assert b.iterations == s.iterations
        assert b.infeasible_plans == s.infeasible_plans
    assert any(b.goal_reached for b in batched), "easy goals should be reached"


def test_batched_resume(tmp_path):
    """run_world_suite_batched(resume=True) reruns only the missing worlds
    and draws their true params bit-identical to the fresh full run
    (VERDICT r4 polish: the batched runner had no resume).  The missing
    world is placed at suite index 0 so its guidance seed also matches and
    the resumed outcome must be exactly the fresh one."""
    import json

    from armour_tpu.experiments import run_world_suite_batched
    from armour_tpu.worlds import save_world_csv

    worlds = _worlds()
    paths = []
    for i, w in enumerate(worlds):
        p = tmp_path / f"w{i}.csv"
        save_world_csv(w, str(p))
        paths.append(str(p))
    res_path = str(tmp_path / "results.json")

    full = run_world_suite_batched(paths, ROBOT, CFG, max_iterations=4,
                                   seed=0, verbose=False,
                                   results_path=res_path)

    # drop world 0 from the saved results and resume
    with open(res_path) as f:
        doc = json.load(f)
    doc["results"] = [d for d in doc["results"] if d["world"] != "w0.csv"]
    with open(res_path, "w") as f:
        json.dump(doc, f)

    resumed = run_world_suite_batched(paths, ROBOT, CFG, max_iterations=4,
                                      seed=0, verbose=False,
                                      results_path=res_path, resume=True)
    assert [r.world for r in resumed] == [r.world for r in full]
    for a, b in zip(resumed, full):
        assert a.bucket() == b.bucket()
        assert a.summary.iterations == b.summary.iterations
        assert a.summary.infeasible_plans == b.summary.infeasible_plans
    # fully-resumed call runs nothing and returns the saved records
    again = run_world_suite_batched(paths, ROBOT, CFG, max_iterations=4,
                                    seed=0, verbose=False,
                                    results_path=res_path, resume=True)
    assert [r.bucket() for r in again] == [r.bucket() for r in full]
