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
threads; here the whole thing is batched dense tensor arithmetic, and the
per-iteration evaluation is a single contraction of the link k-polynomials
with phi(k).

TPU layout note: every array keeps the huge fused (T*J*O) axis LAST and the
tiny combo/coordinate axes leading ([C, 3, N]); trailing dims are padded to
(8, 128) tiles by the TPU memory layout, so a [N, C, 3] layout would waste
5-30x HBM in padding (measured: batch-64 solve OOMed at 22 GB before this
layout, fits comfortably after).
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
    """Precomputed polytope data; N = T*J*O flattened, C = 36 combos."""

    A: jnp.ndarray      # [C, 3, N] unit normals (0 for degenerate pairs)
    d: jnp.ndarray      # [C, N]
    delta: jnp.ndarray  # [C, N]
    dims: tuple = dataclasses.field(metadata=dict(static=True))  # (T, J, O)


def build_hyperplanes(frs: LinkFRS, obs: ObstacleSet) -> Hyperplanes:
    """Buffer + polytope construction, once per plan
    (CollisionChecking.cu:74-228)."""
    T, J = frs.radius.shape[:2]
    O = obs.centers.shape[0]
    N = T * J * O
    dt = frs.radius.dtype
    obs_g = jnp.broadcast_to(obs.generators[None, None], (T, J, O, 3, 3))
    shape_g = jnp.broadcast_to(frs.shape_gens[:, :, None], (T, J, O, 3, 3))
    rad_diag = frs.radius[:, :, None, :, None] * jnp.eye(3, dtype=dt)
    rad_g = jnp.broadcast_to(rad_diag, (T, J, O, 3, 3))
    # [T,J,O,3,9] -> [3, 9, N] (huge axis last)
    G = jnp.concatenate([obs_g, shape_g, rad_g], axis=-1)
    G = jnp.moveaxis(G.reshape(N, 3, N_BUF_GEN), 0, -1)      # [3, 9, N]

    ga = G[:, _COMBS[:, 0], :]          # [3, C, N]
    gb = G[:, _COMBS[:, 1], :]
    cr = jnp.cross(ga, gb, axis=0)      # [3, C, N]
    norm = jnp.sqrt(jnp.sum(cr * cr, axis=0, keepdims=True))
    A = jnp.where(norm > 0, cr / jnp.where(norm > 0, norm, 1.0), 0.0)  # [3,C,N]
    # delta[c, n] = sum_g |sum_a A[a,c,n] G[a,g,n]|
    delta = jnp.sum(jnp.abs(jnp.einsum("acn,agn->cgn", A, G)), axis=1)  # [C, N]
    cb = jnp.broadcast_to(obs.centers.T[:, None, None, :], (3, T, J, O)).reshape(3, 1, N)
    d = jnp.sum(A * cb, axis=0)                                         # [C, N]
    return Hyperplanes(A=jnp.moveaxis(A, 1, 0), d=d, delta=delta, dims=(T, J, O))


def link_centers(frs: LinkFRS, phi_k: jnp.ndarray) -> jnp.ndarray:
    """Sliced link centers p(k) [T, J, 3] (NLPclass.cu:304-315)."""
    return jnp.einsum("tjam,m->tja", frs.center_coef, phi_k)


def collision_constraints(hyp: Hyperplanes, obs: ObstacleSet, p: jnp.ndarray):
    """Constraint values g [T, J, O] (<= 0 safe) and dg/dp [T, J, O, 3]
    (argmax hyperplane, checkCollisionKernel semantics)."""
    T, J, O = hyp.dims
    N = T * J * O
    A = hyp.A                                              # [C, 3, N]
    # p [T, J, 3] -> [3, N] broadcast over obstacles
    pb = jnp.broadcast_to(
        jnp.moveaxis(p, -1, 0)[:, :, :, None], (3, T, J, O)
    ).reshape(3, N)
    Ap = jnp.einsum("can,an->cn", A, pb)                   # [C, N]
    ok = jnp.sum(jnp.abs(A), axis=1) > 0                   # [C, N]
    pos = jnp.where(ok, Ap - (hyp.d + hyp.delta), -BIG)
    neg = jnp.where(ok, -Ap - (-hyp.d + hyp.delta), -BIG)
    both = jnp.concatenate([pos, neg], axis=0)             # [2C, N]
    m = jnp.max(both, axis=0)                              # [N]
    mask = jnp.broadcast_to(obs.mask[None, None, :], (T, J, O)).reshape(N)
    g = jnp.where(mask, -m, -BIG)

    C = A.shape[0]
    idx = jnp.argmax(both, axis=0)                         # [N]
    sign = jnp.where(idx < C, -1.0, 1.0)
    comb = jnp.where(idx < C, idx, idx - C)
    A_sel = jnp.take_along_axis(A, comb[None, None, :], axis=0)[0]  # [3, N]
    grad_p = sign[None, :] * A_sel                         # [3, N] = dg/dp
    grad_p = jnp.where(mask[None, :], grad_p, 0.0)
    return g.reshape(T, J, O), jnp.moveaxis(grad_p.reshape(3, T, J, O), 0, -1)


def collision_constraint_grads(grad_p: jnp.ndarray, frs: LinkFRS,
                               dphi_k: jnp.ndarray) -> jnp.ndarray:
    """dg/dk [T, J, O, F] via dp/dk = coef . dphi (CollisionChecking.cu:286-297)."""
    dp = jnp.einsum("tjam,mf->tjaf", frs.center_coef, dphi_k)  # [T,J,3,F]
    return jnp.einsum("tjoa,tjaf->tjof", grad_p, dp)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScreenedCollision:
    """Top-K candidate collision constraint rows for the solver hot loop.

    The reference evaluates all T*J*O constraints on the GPU every Ipopt
    iteration (CollisionChecking.cu:230-299).  Almost all rows are provably
    inactive over the whole k-box; we rank rows by an upper bound of their
    constraint value over k in [-1,1]^F and keep the K worst.  SOUNDNESS: the
    final feasibility check (nlp.max_violations) still evaluates the FULL
    set, so a dropped-but-active row can only turn a claimed-feasible plan
    into an infeasible verdict (-> braking), never an unsafe plan.
    """

    A: jnp.ndarray        # [C, 3, K]
    d: jnp.ndarray        # [C, K]
    delta: jnp.ndarray    # [C, K]
    coef: jnp.ndarray     # [3, B, K] link-center k-polynomials of each row
    mask: jnp.ndarray     # [K] real-obstacle mask


def screen_collision(hyp: Hyperplanes, obs: ObstacleSet, frs: LinkFRS,
                     K: int) -> ScreenedCollision:
    """Rank all rows by sup_k g(k) upper bound; gather the K worst."""
    T, J, O = hyp.dims
    N = T * J * O
    A = hyp.A                                                # [C, 3, N]
    C = A.shape[0]
    B = frs.center_coef.shape[-1]

    # link-center polynomial per row: coef [T, J, 3, B] -> [3, B, N]
    coef_n = jnp.broadcast_to(
        jnp.moveaxis(frs.center_coef, (2, 3), (0, 1))[:, :, :, :, None],
        (3, B, T, J, O),
    ).reshape(3, B, N)

    Apc = jnp.einsum("can,an->cn", A, coef_n[:, 0, :])        # center term
    # sup_k |sum_a A . coef_m| summed over non-constant monomials
    Ac = jnp.einsum("can,abn->cbn", A, coef_n[:, 1:, :])      # [C, B-1, N]
    r = jnp.sum(jnp.abs(Ac), axis=1)                          # [C, N]
    ok = jnp.sum(jnp.abs(A), axis=1) > 0
    pos_lb = jnp.where(ok, Apc - r - (hyp.d + hyp.delta), -BIG)
    neg_lb = jnp.where(ok, -Apc - r - (-hyp.d + hyp.delta), -BIG)
    m_lb = jnp.max(jnp.maximum(pos_lb, neg_lb), axis=0)       # [N]
    mask = jnp.broadcast_to(obs.mask[None, None, :], (T, J, O)).reshape(N)
    g_up = jnp.where(mask, -m_lb, -BIG)                       # upper bnd of g

    _, idx = jax.lax.top_k(g_up, min(K, N))                   # worst K rows
    return ScreenedCollision(
        A=jnp.take(A, idx, axis=-1),
        d=jnp.take(hyp.d, idx, axis=-1),
        delta=jnp.take(hyp.delta, idx, axis=-1),
        coef=jnp.take(coef_n, idx, axis=-1),
        mask=jnp.take(mask, idx),
    )


def screened_constraints(sc: ScreenedCollision, phi: jnp.ndarray):
    """g [K] and dg/dp-chain data for the screened rows."""
    p = jnp.einsum("abk,b->ak", sc.coef, phi)                 # [3, K]
    Ap = jnp.einsum("cak,ak->ck", sc.A, p)
    ok = jnp.sum(jnp.abs(sc.A), axis=1) > 0
    pos = jnp.where(ok, Ap - (sc.d + sc.delta), -BIG)
    neg = jnp.where(ok, -Ap - (-sc.d + sc.delta), -BIG)
    both = jnp.concatenate([pos, neg], axis=0)
    m = jnp.max(both, axis=0)
    g = jnp.where(sc.mask, -m, -BIG)

    C = sc.A.shape[0]
    idx = jnp.argmax(both, axis=0)
    sign = jnp.where(idx < C, -1.0, 1.0)
    comb = jnp.where(idx < C, idx, idx - C)
    A_sel = jnp.take_along_axis(sc.A, comb[None, None, :], axis=0)[0]   # [3, K]
    grad_p = jnp.where(sc.mask[None, :], sign[None, :] * A_sel, 0.0)
    return g, grad_p


def screened_constraint_grads(sc: ScreenedCollision, grad_p: jnp.ndarray,
                              dphi: jnp.ndarray) -> jnp.ndarray:
    """dg/dk [K, F]: grad_p [3, K] chained with dp/dk = coef . dphi."""
    dp = jnp.einsum("abk,bf->afk", sc.coef, dphi)             # [3, F, K]
    return jnp.einsum("ak,afk->kf", grad_p, dp)
