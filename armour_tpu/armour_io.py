"""Reference-format file I/O: armour.in / armour.out and the four FRS dumps.

The reference planner is driven through text files (armour_main.cu:40-80
parses armour.in; 305-372 writes armour.out, armour_joint_position_center.out,
armour_joint_position_radius.out, armour_control_input_radius.out,
armour_constraints.out; uarmtd_planner.m:156-233 is the MATLAB side).
Implementing the same formats lets any reference dump be diffed against this
framework at the BASELINE.json <=1e-4 criterion, and lets this planner serve
as a drop-in replacement binary for the reference's MATLAB harness.

Obstacle layout in armour.in (armour_main.cu:74-77 + CollisionChecking.cu
indexing): per obstacle 12 numbers = center xyz then 3 generators as
consecutive 3-vectors (rows); our ObstacleSet stores generators as COLUMNS.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ArmourIn:
    q0: np.ndarray        # [F]
    qd0: np.ndarray       # [F]
    qdd0: np.ndarray      # [F]
    q_des: np.ndarray     # [F]
    centers: np.ndarray   # [n, 3]
    generators: np.ndarray  # [n, 3, 3] columns = generators


def read_armour_in(path: str, num_factors: int = 7) -> ArmourIn:
    vals = np.asarray(_read_tokens(path), dtype=np.float64)
    F = num_factors
    q0, qd0, qdd0, q_des = (vals[i * F:(i + 1) * F] for i in range(4))
    n = int(round(vals[4 * F]))
    body = vals[4 * F + 1: 4 * F + 1 + n * 12].reshape(n, 12)
    centers = body[:, :3]
    # rows of the file are generator vectors -> transpose to column convention
    generators = body[:, 3:].reshape(n, 3, 3).transpose(0, 2, 1)
    return ArmourIn(q0=q0, qd0=qd0, qdd0=qdd0, q_des=q_des,
                    centers=centers, generators=generators)


def _read_tokens(path: str):
    with open(path) as f:
        return [float(t) for t in f.read().split()]


def write_armour_in(path: str, data: ArmourIn) -> None:
    with open(path, "w") as f:
        for arr in (data.q0, data.qd0, data.qdd0, data.q_des):
            f.write(" ".join(f"{x:.10g}" for x in arr) + "\n")
        n = data.centers.shape[0]
        f.write(f"{n}\n")
        for i in range(n):
            row = list(data.centers[i]) + list(data.generators[i].T.ravel())
            f.write(" ".join(f"{x:.10g}" for x in row) + "\n")


def write_armour_out(path: str, k_opt: Optional[np.ndarray], millis: float) -> None:
    """k_opt lines then total ms; -1 if infeasible (armour_main.cu:314-325)."""
    with open(path, "w") as f:
        if k_opt is not None and np.all(np.isfinite(k_opt)):
            for x in np.asarray(k_opt).ravel():
                f.write(f"{x:.10g}\n")
        else:
            f.write("-1\n")
        f.write(f"{millis:.10g}")


def read_armour_out(path: str, num_factors: int = 7) -> Tuple[Optional[np.ndarray], float]:
    vals = _read_tokens(path)
    if len(vals) == 2 and vals[0] == -1:
        return None, vals[1]
    return np.asarray(vals[:num_factors]), vals[num_factors]


def plan_from_armour_in(in_path: str, out_dir: str, robot, cfg,
                        planner_step=None) -> dict:
    """Run one planning iteration from an armour.in file and write every
    reference output file into out_dir (armour_main.cu main() equivalent
    with file I/O).  Returns the parsed result dict."""
    import os
    import time

    import jax
    import jax.numpy as jnp

    from .collision import pad_obstacles
    from .dynamics import torque_frs
    from .jrs import build_jrs
    from .kinematics import forward_occupancy, reduce_links
    from .planner import make_planner
    from .pz.basis import make_basis

    data = read_armour_in(in_path, robot.num_factors)
    obs = pad_obstacles(data.centers, data.generators, cfg.max_obstacles, cfg.dtype)
    step = planner_step if planner_step is not None else make_planner(robot, cfg)

    t0 = time.perf_counter()
    res = step(jnp.asarray(data.q0, cfg.dtype), jnp.asarray(data.qd0, cfg.dtype),
               jnp.asarray(data.qdd0, cfg.dtype), jnp.asarray(data.q_des, cfg.dtype),
               obs)
    k = np.asarray(res.k)
    millis = 1e3 * (time.perf_counter() - t0)

    # FRS dumps: rebuild the reachable sets and slice at k (or 0 if infeasible,
    # matching the reference which dumps whatever finalize_solution held)
    basis = make_basis(robot.num_factors, cfg.max_poly_degree)

    @jax.jit
    def frs_parts(q0, qd0, qdd0):
        jrs = build_jrs(q0, qd0, qdd0, robot, cfg, basis)
        links = forward_occupancy(jrs, robot, cfg, basis)
        frs = reduce_links(links, basis)
        torque = torque_frs(jrs, robot, cfg, basis)
        return frs, torque

    frs, torque = frs_parts(jnp.asarray(data.q0, cfg.dtype),
                            jnp.asarray(data.qd0, cfg.dtype),
                            jnp.asarray(data.qdd0, cfg.dtype))
    k_slice = np.where(np.isfinite(k), k, 0.0)
    phi = np.asarray(basis.phi(jnp.asarray(k_slice, cfg.dtype)))
    centers = np.einsum("tjab,b->tja", np.asarray(frs.center_coef), phi)  # [T,J,3]
    shape_gens = np.asarray(frs.shape_gens)                                # [T,J,3,3]
    radius = np.asarray(frs.radius)                                        # [T,J,3]
    T, J = centers.shape[:2]

    os.makedirs(out_dir, exist_ok=True)
    write_armour_out(os.path.join(out_dir, "armour.out"),
                     k if np.all(np.isfinite(k)) else None, millis)

    with open(os.path.join(out_dir, "armour_joint_position_center.out"), "w") as f:
        for i in range(T):
            for j in range(J):
                f.write(" ".join(f"{x:.10g}" for x in centers[i, j]) + " \n")

    with open(os.path.join(out_dir, "armour_joint_position_radius.out"), "w") as f:
        for i in range(T):
            for j in range(J):
                gen6 = np.concatenate(
                    [shape_gens[i, j], np.diag(radius[i, j])], axis=1)  # [3, 6]
                for r in range(3):
                    f.write(" ".join(f"{x:.10g}" for x in gen6[r]) + " \n")

    if not cfg.turn_off_input_constraints:
        tr = np.asarray(torque.torque_radius)                              # [T, F]
        with open(os.path.join(out_dir, "armour_control_input_radius.out"), "w") as f:
            for i in range(T):
                f.write(" ".join(f"{x:.10g}" for x in tr[i]) + " \n")

    # armour_constraints.out (armour_main.cu:366-371): every constraint value
    # at the returned k, one per line.  Reference ordering (NLPclass.cu:46-54):
    # control input, time-major (index t*F + j, NLPclass.cu:308) [T*F rows];
    # collision value LINK-MAJOR (index (link*T + t)*O + o — the per-link
    # memcpy at CollisionChecking.cu:128 and the finalize check at
    # NLPclass.cu:475) [J*T*O rows]; then the 4*F state-extremum rows
    # (q_min, q_max, qd_min, qd_max per factor).
    from .collision import (build_hyperplanes, collision_constraints,
                            eval_link_polys)
    from .nlp import joint_position_extrema, joint_velocity_extrema
    from .jrs import build_jrs as _build_jrs

    @jax.jit
    def constraint_values(q0, qd0, qdd0, kk):
        jrs = build_jrs(q0, qd0, qdd0, robot, cfg, basis)
        frs2 = reduce_links(forward_occupancy(jrs, robot, cfg, basis), basis)
        tq = torque_frs(jrs, robot, cfg, basis)
        hyp = build_hyperplanes(frs2, obs)
        ph = basis.phi(kk)
        Tn = tq.u_coef.shape[0]
        u = (tq.u_coef.reshape(-1, ph.shape[0]) @ ph).reshape(Tn, -1)  # [T,F]
        g_col = collision_constraints(hyp, obs, eval_link_polys(frs2, ph))
        q_min, q_max, _, _ = joint_position_extrema(kk, jrs.traj, cfg)
        qd_min, qd_max, _, _ = joint_velocity_extrema(kk, jrs.traj, cfg)
        return u, g_col, jnp.concatenate([q_min, q_max, qd_min, qd_max])

    u_v, g_col_v, state_v = constraint_values(
        jnp.asarray(data.q0, cfg.dtype), jnp.asarray(data.qd0, cfg.dtype),
        jnp.asarray(data.qdd0, cfg.dtype), jnp.asarray(k_slice, cfg.dtype))
    n_obs = len(data.centers)
    with open(os.path.join(out_dir, "armour_constraints.out"), "w") as f:
        for row in np.asarray(u_v):
            for x in row:
                f.write(f"{x:.6g}\n")
        gc = np.asarray(g_col_v)[:, :, :n_obs]       # [T, J, O], drop padding
        # link-major file order: (link*T + t)*O + o (CollisionChecking.cu:128)
        for x in np.transpose(gc, (1, 0, 2)).reshape(-1):
            f.write(f"{x:.6g}\n")
        for x in np.asarray(state_v):
            f.write(f"{x:.6g}\n")

    return {"k": k, "feasible": bool(np.all(np.isfinite(k))), "millis": millis,
            "link_centers": centers, "link_generators": shape_gens,
            "link_radius": radius,
            "constraint_torque": np.asarray(u_v),        # [T, F]
            "constraint_collision": gc,                  # [T, J, O]
            "constraint_state": np.asarray(state_v)}     # [4*F]
