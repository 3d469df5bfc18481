"""Trial replay: run_trial trace recording + scripts/replay_trial.py render
(kinova_replay_trial.m / robot_arm_agent.m:1146-1210 equivalent)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from armour_tpu.collision import pad_obstacles
from armour_tpu.config import ArmourConfig
from armour_tpu.models.kinova import kinova_gen3
from armour_tpu.planner import make_planner
from armour_tpu.simulator import run_trial, sample_true_params
from armour_tpu.worlds import World

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_trace_written_and_replay_renders(tmp_path):
    robot = kinova_gen3()
    cfg = ArmourConfig(dtype=jnp.float64, num_time_steps=16, screen_k=256,
                       max_obstacles=8)
    start = np.linspace(-0.3, 0.3, 7)
    world = World(start=start, goal=start + 0.1,
                  obstacle_centers=np.array([[0.5, 0.5, 0.5]]),
                  obstacle_generators=np.stack([np.diag([0.05] * 3)]))
    obs = pad_obstacles(world.obstacle_centers, world.obstacle_generators,
                        cfg.max_obstacles, cfg.dtype)
    tp = sample_true_params(robot, np.random.default_rng(0), scale=1.0)
    step = make_planner(robot, cfg)
    trace = str(tmp_path / "trace.npz")
    s = run_trial(world, robot, cfg, step, obs, tp, max_iterations=3,
                  trace_path=trace)

    tr = np.load(trace)
    I = tr["k"].shape[0]
    assert I == s.iterations
    assert tr["q"].shape == tr["q_des"].shape
    assert tr["q"].shape[0] == I and tr["q"].shape[2] == 7
    assert str(tr["robot_name"]) == robot.name

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "replay_trial.py"),
         trace, str(tmp_path / "out"), "4"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(tmp_path / "out_replay.png")
    assert os.path.exists(tmp_path / "out_errors.png")
