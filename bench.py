"""Benchmark: safe planning solves per second on real TPU hardware.

Measures the full planning iteration (JRS -> PZ FK/RNEA -> obstacle
hyperplanes -> NLP solve) on CONTESTED instances: the saved-world benchmark
scenes (13-40 obstacles, the reference's own suite) with waypoints from the
end-effector RRT* HLP — i.e. the exact problems the closed-loop suite
solves, not synthetic pushed-away obstacles.

Reports ONE JSON line:
  value / solves_per_s : batch-64 throughput of the full planning step
  latency_batch1_ms    : single-solve latency — the real-time criterion
                         (must be < 500 ms; armour_main.cu:227-229 budget)
  reachset_ms / solver_ms : jit-prefix split of the batch step (the
                         reference couples its Ipopt budget to measured
                         reachset time, armour_main.cu:227)
  feasible             : how many of the 64 scene instances admit a plan
                         (reported separately from throughput; infeasible
                         instances cost the same wall time)
  vs_baseline          : solves/s divided by the reference's hard real-time
                         rate of 2 solves/s/robot = how many real-time
                         robots one chip serves.
"""

import glob
import json

import numpy as np

import jax
import jax.numpy as jnp


def _scene_instances(cfg, batch):
    """Planning instances from the saved benchmark scenes: start state at
    rest, waypoint from the EE RRT* HLP (kinova_run_100_worlds.m settings)."""
    from armour_tpu.collision import pad_obstacles
    from armour_tpu.hlp import EndEffectorRRTStarHLP
    from armour_tpu.models.kinova import kinova_gen3
    from armour_tpu.worlds import load_world_csv

    robot = kinova_gen3()
    paths = sorted(glob.glob("saved_worlds/random/*.csv"))
    assert paths, "saved_worlds/random is missing"
    worlds = [load_world_csv(paths[i % len(paths)]) for i in range(batch)]
    q0 = np.stack([w.start for w in worlds]).astype(np.float32)
    wps = np.stack([
        EndEffectorRRTStarHLP(w, robot, lookahead=0.1, seed=i)
        .get_waypoint(w.start)
        for i, w in enumerate(worlds)
    ]).astype(np.float32)
    obs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[pad_obstacles(w.obstacle_centers, w.obstacle_generators,
                        cfg.max_obstacles, cfg.dtype) for w in worlds],
    )
    zeros = jnp.zeros_like(jnp.asarray(q0))
    return robot, (jnp.asarray(q0), zeros, zeros, jnp.asarray(wps), obs)


def main():
    from armour_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from armour_tpu.config import ArmourConfig
    from armour_tpu.planner import make_batch_planner, make_planner
    from armour_tpu.utils.timing import bench as _bench

    cfg = ArmourConfig(dtype=jnp.float32)
    # throughput batch: the planning step is launch-overhead-bound well past
    # batch 64 on one chip (small tensors, many fused kernels), so larger
    # lockstep batches raise solves/s almost linearly until HBM pressure;
    # override for sweeps with ARMOUR_BENCH_BATCH.
    import os as _os

    batch = int(_os.environ.get("ARMOUR_BENCH_BATCH", "64"))
    robot, args = _scene_instances(cfg, batch)

    # --- batch throughput (the TPU scale axis) ---
    step = make_batch_planner(robot, cfg)
    dt, out = _bench(lambda: step(*args), iters=5)
    solves_per_s = batch / dt
    n_feasible = int(np.sum(np.asarray(out.feasible)))

    # --- batch-1 latency (the real-time criterion) + p99 over instances ---
    step1 = make_planner(robot, cfg)
    args1 = jax.tree.map(lambda x: x[0], args)
    dt1, _ = _bench(lambda: step1(*args1), iters=10)
    import time as _time

    from armour_tpu.utils.timing import sync as _sync

    # per-instance latency distribution.  Each sample is timed with the same
    # sync() primitive as _bench (true host round-trip) — NOT
    # block_until_ready, which this platform's tunnel returns from before
    # execution completes (see utils/timing.py; the round-4 p99 measured
    # with block_until_ready came out BELOW the reliable batch-1 mean).
    lats = []
    instances = [jax.tree.map(lambda x: x[i], args)
                 for i in range(min(48, batch))]
    _sync(step1(*instances[0]))          # warm any per-shape work
    for ai in instances:
        t0 = _time.perf_counter()
        _sync(step1(*ai))
        lats.append(_time.perf_counter() - t0)
    lat_p99 = float(np.percentile(lats, 99))
    lat_p50 = float(np.percentile(lats, 50))
    # internal consistency (round-4 weak #3): the p99 of single-sample
    # latencies must sit at or above the best-of-10 batch-1 time measured
    # with the same primitive; report the check so an incoherent timing
    # path is visible in the artifact
    lat_consistent = bool(lat_p99 >= dt1 * 0.99)

    # --- reachset vs solver split (jit-prefix timing at the same batch) ---
    from armour_tpu.collision import build_hyperplanes, screen_collision
    from armour_tpu.dynamics import torque_frs
    from armour_tpu.jrs import build_jrs
    from armour_tpu.kinematics import forward_occupancy, reduce_links
    from armour_tpu.pz.basis import make_basis

    basis = make_basis(robot.num_factors, cfg.max_poly_degree)

    @jax.jit
    def reachsets_only(q0, qd0, qdd0, q_des, obs):
        def one(q0, qd0, qdd0, o):
            jrs = build_jrs(q0, qd0, qdd0, robot, cfg, basis)
            frs = reduce_links(forward_occupancy(jrs, robot, cfg, basis), basis)
            tq = torque_frs(jrs, robot, cfg, basis)
            hyp = build_hyperplanes(frs, o)
            sc = screen_collision(hyp, obs=o, frs=frs, K=cfg.screen_k)
            return (tq.torque_radius.sum() + sc.d.sum())
        return jax.vmap(one)(q0, qd0, qdd0, obs).sum()

    dt_rs, _ = _bench(lambda: reachsets_only(*args), iters=5)

    # --- real-time budget semantics (armour_main.cu:227-229): the solver's
    # wall-time allowance per solve is 0.5*DURATION - t_reachsets - 0.05 s,
    # with t_reachsets MEASURED at batch 1 (the deployment shape) ---
    dt_rs1, _ = _bench(lambda: reachsets_only(
        *jax.tree.map(lambda x: x[:1], args)), iters=5)
    solver_budget_s = 0.5 * cfg.duration - dt_rs1 - 0.05
    solver1_s = max(dt1 - dt_rs1, 0.0)

    result = {
        "metric": "planning_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 2.0, 2),
        "batch": batch,
        "feasible": n_feasible,
        "latency_ms_per_batch": round(dt * 1e3, 2),
        "latency_batch1_ms": round(dt1 * 1e3, 2),
        "latency_p50_ms": round(lat_p50 * 1e3, 2),
        "latency_p99_ms": round(lat_p99 * 1e3, 2),
        "latency_consistent": lat_consistent,
        "realtime_ok": bool(lat_p99 < 0.5),
        "reachset_ms": round(dt_rs * 1e3, 2),
        "solver_ms": round((dt - dt_rs) * 1e3, 2),
        "reachset_batch1_ms": round(dt_rs1 * 1e3, 2),
        "solver_budget_ms": round(solver_budget_s * 1e3, 2),
        "budget_ok": bool(solver1_s <= solver_budget_s),
        "instances": "saved_worlds/random + EE-RRT* waypoints",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
