"""Obstacle buffering, zonotope->H-polytope hyperplanes, collision constraints.

TPU-native equivalent of CollisionChecking.cu: for every (time, link,
obstacle) the obstacle box is buffered with the link's 6 k-independent
generators (3 rotated shape generators + 3 interval radii,
bufferObstaclesKernel, CollisionChecking.cu:136-167), the buffered zonotope's
H-representation is built from the 36 cross products of generator pairs
(polytope_PH, CollisionChecking.cu:169-228), and the constraint is the signed
distance of the k-sliced link center outside that polytope
(checkCollisionKernel, CollisionChecking.cu:230-299):

    g = -max_c ( +-(A_c . p(k) - d_c) - delta_c )  <= 0   (safe)

The reference launches CUDA kernels over a (128 x n_obs) grid with 36
threads; here the whole thing is a batched einsum over the dense
[T, J, O, C] tensor, and the per-iteration evaluation is a single
contraction of the link k-polynomials with phi(k).
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .kinematics import LinkFRS
from .pz.basis import KBasis

BIG = 1e8
# 9 buffered generators -> C(9,2) = 36 combinations (CollisionChecking.h:6-7)
N_BUF_GEN = 9
_COMBS = np.array(list(itertools.combinations(range(N_BUF_GEN), 2)), dtype=np.int32)
N_COMB = len(_COMBS)  # 36


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObstacleSet:
    """Padded box-obstacle zonotopes.  centers [O, 3], generators [O, 3, 3]
    (columns = generators), mask [O] (True = real obstacle)."""

    centers: jnp.ndarray
    generators: jnp.ndarray
    mask: jnp.ndarray


def pad_obstacles(centers, generators, max_obstacles: int, dtype=jnp.float32) -> ObstacleSet:
    centers = np.asarray(centers, dtype=np.float64).reshape(-1, 3)
    generators = np.asarray(generators, dtype=np.float64).reshape(-1, 3, 3)
    n = centers.shape[0]
    assert n <= max_obstacles
    c = np.zeros((max_obstacles, 3))
    g = np.zeros((max_obstacles, 3, 3))
    m = np.zeros(max_obstacles, dtype=bool)
    c[:n] = centers
    g[:n] = generators
    m[:n] = True
    return ObstacleSet(
        centers=jnp.asarray(c, dtype),
        generators=jnp.asarray(g, dtype),
        mask=jnp.asarray(m),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Hyperplanes:
    """Precomputed polytope data per (T, J, O, C)."""

    A: jnp.ndarray      # [T, J, O, C, 3] unit normals (0 for degenerate pairs)
    d: jnp.ndarray      # [T, J, O, C]
    delta: jnp.ndarray  # [T, J, O, C]


def build_hyperplanes(frs: LinkFRS, obs: ObstacleSet) -> Hyperplanes:
    """Buffer + polytope construction, once per plan
    (CollisionChecking.cu:74-228)."""
    # buffered generator matrix [T, J, O, 3, 9]
    T, J = frs.radius.shape[:2]
    O = obs.centers.shape[0]
    dt = frs.radius.dtype
    obs_g = jnp.broadcast_to(obs.generators[None, None], (T, J, O, 3, 3))
    shape_g = jnp.broadcast_to(frs.shape_gens[:, :, None], (T, J, O, 3, 3))
    rad_g = jnp.zeros((T, J, O, 3, 3), dt)
    rad_g = rad_g.at[..., 0, 0].set(frs.radius[:, :, None, 0])
    rad_g = rad_g.at[..., 1, 1].set(frs.radius[:, :, None, 1])
    rad_g = rad_g.at[..., 2, 2].set(frs.radius[:, :, None, 2])
    G = jnp.concatenate([obs_g, shape_g, rad_g], axis=-1)  # [T,J,O,3,9]

    ga = G[..., _COMBS[:, 0]]  # [T,J,O,3,C]
    gb = G[..., _COMBS[:, 1]]
    cr = jnp.stack(
        [
            ga[..., 1, :] * gb[..., 2, :] - ga[..., 2, :] * gb[..., 1, :],
            ga[..., 2, :] * gb[..., 0, :] - ga[..., 0, :] * gb[..., 2, :],
            ga[..., 0, :] * gb[..., 1, :] - ga[..., 1, :] * gb[..., 0, :],
        ],
        axis=-1,
    )  # [T,J,O,C,3]
    norm = jnp.linalg.norm(cr, axis=-1, keepdims=True)
    A = jnp.where(norm > 0, cr / jnp.where(norm > 0, norm, 1.0), 0.0)
    d = jnp.einsum("tjoca,oa->tjoc", A, obs.centers)
    delta = jnp.sum(jnp.abs(jnp.einsum("tjoca,tjoag->tjocg", A, G)), axis=-1)
    return Hyperplanes(A=A, d=d, delta=delta)


def link_centers(frs: LinkFRS, phi_k: jnp.ndarray) -> jnp.ndarray:
    """Sliced link centers p(k) [T, J, 3] (NLPclass.cu:304-315)."""
    return jnp.einsum("tjam,m->tja", frs.center_coef, phi_k)


def collision_constraints(hyp: Hyperplanes, obs: ObstacleSet, p: jnp.ndarray):
    """Constraint values g [T, J, O] (<= 0 safe) and the argmax hyperplane
    data needed for gradients (checkCollisionKernel semantics)."""
    Ap = jnp.einsum("tjoca,tja->tjoc", hyp.A, p)
    ok = jnp.sum(jnp.abs(hyp.A), axis=-1) > 0
    pos = jnp.where(ok, Ap - (hyp.d + hyp.delta), -BIG)
    neg = jnp.where(ok, -Ap - (-hyp.d + hyp.delta), -BIG)
    both = jnp.concatenate([pos, neg], axis=-1)  # [T,J,O,2C]
    m = jnp.max(both, axis=-1)
    g = jnp.where(obs.mask[None, None, :], -m, -BIG)

    idx = jnp.argmax(both, axis=-1)                       # [T,J,O]
    sign = jnp.where(idx < N_COMB, -1.0, 1.0)             # d(-max)/dp sign
    comb = jnp.where(idx < N_COMB, idx, idx - N_COMB)
    A_sel = jnp.take_along_axis(hyp.A, comb[..., None, None], axis=-2)[..., 0, :]
    grad_p = sign[..., None] * A_sel                      # [T,J,O,3] = dg/dp
    grad_p = jnp.where(obs.mask[None, None, :, None], grad_p, 0.0)
    return g, grad_p


def collision_constraint_grads(grad_p: jnp.ndarray, frs: LinkFRS,
                               dphi_k: jnp.ndarray) -> jnp.ndarray:
    """dg/dk [T, J, O, F] via dp/dk = coef . dphi (CollisionChecking.cu:286-297)."""
    dp = jnp.einsum("tjam,mf->tjaf", frs.center_coef, dphi_k)  # [T,J,3,F]
    return jnp.einsum("tjoa,tjaf->tjof", grad_p, dp)
