"""Batched polynomial zonotopes (BPZ) as dense JAX tensors.

A BPZ represents, per tensor entry, the set

    { coef[0] + sum_m coef[m] * phi_m(k) + sum_e egen[e] * eps_e + rad * eps
      : k in [-1,1]^nf, eps_e in [-1,1], eps in [-1,1] }

with phi_m the static k-monomial basis (basis.KBasis), egen the linear
error-generator block and rad an independent interval radius.  This is the
TPU-native equivalent of the reference's PZsparse (PZsparse.h:63-211): the
k-polynomial part is what slice()/gradient-slice evaluate in the NLP, the
error block is what reduce()/reduce_link_PZ() extract, and rad is the
`independent` matrix.

All ops broadcast over arbitrary leading batch dims (time steps, worlds, ...)
so the whole reachable-set pipeline is expressed as a handful of fused
batched tensor contractions instead of per-monomial list manipulation.

Semantics of each op mirror the reference implementation cited in the
docstrings; conservative outward rounding happens exactly where the
reference's simplify()/reduce() would move coefficients into `independent`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .basis import KBasis, error_layout, make_basis


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BPZ:
    coef: jnp.ndarray  # [..., B]   k-poly coefficients; index 0 = center
    egen: jnp.ndarray  # [..., E]   linear error-generator coefficients
    rad: jnp.ndarray   # [...]      independent radius (>= 0)

    @property
    def center(self) -> jnp.ndarray:
        return self.coef[..., 0]

    @property
    def shape(self):
        return self.rad.shape


def _nf_from(coef_B: int, basis: KBasis) -> int:
    assert coef_B == basis.size
    return basis.nf


def zeros(shape, basis: KBasis, dtype=jnp.float32) -> BPZ:
    E = error_layout(basis.nf)["size"]
    return BPZ(
        coef=jnp.zeros((*shape, basis.size), dtype=dtype),
        egen=jnp.zeros((*shape, E), dtype=dtype),
        rad=jnp.zeros(shape, dtype=dtype),
    )


def const(x: jnp.ndarray, basis: KBasis) -> BPZ:
    x = jnp.asarray(x)
    z = zeros(x.shape, basis, x.dtype)
    return BPZ(coef=z.coef.at[..., 0].set(x), egen=z.egen, rad=z.rad)


def from_interval(center: jnp.ndarray, radius: jnp.ndarray, basis: KBasis) -> BPZ:
    """PZ with only an independent interval part (PZsparse.cu:108-117)."""
    p = const(center, basis)
    return BPZ(coef=p.coef, egen=p.egen, rad=jnp.broadcast_to(jnp.asarray(radius, p.rad.dtype), p.rad.shape))


def add(a: BPZ, b: BPZ) -> BPZ:
    """PZsparse.cu:164-186 — concatenate + merge; dense rep just adds."""
    return BPZ(coef=a.coef + b.coef, egen=a.egen + b.egen, rad=a.rad + b.rad)


def add_const(a: BPZ, x) -> BPZ:
    return BPZ(coef=a.coef.at[..., 0].add(x), egen=a.egen, rad=a.rad)


def neg(a: BPZ) -> BPZ:
    return BPZ(coef=-a.coef, egen=-a.egen, rad=a.rad)


def sub(a: BPZ, b: BPZ) -> BPZ:
    return add(a, neg(b))


def scale(a: BPZ, s) -> BPZ:
    """Multiply by an exact scalar/array (PZsparse.cu:417-433)."""
    s = jnp.asarray(s, a.coef.dtype)
    return BPZ(
        coef=a.coef * s[..., None],
        egen=a.egen * s[..., None],
        rad=a.rad * jnp.abs(s),
    )


# ---------------------------------------------------------------------------
# Bilinear core.
#
# prod(x, y):    pairing of coefficient tensors carrying a trailing aligned
#                axis t (basis-pair axis or error axis), contracting any
#                matrix dims:   [..., amat, t] x [..., bmat, t] -> [..., omat, t]
# absprod(x, y): same pairing on nonnegative magnitudes without the trailing
#                axis (interval-radius propagation).
# ---------------------------------------------------------------------------


def _bc_last(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(x[..., None], (*x.shape, n))


def bilinear(a: BPZ, b: BPZ, prod: Callable, absprod: Callable, basis: KBasis,
             slop: float = 0.0, absprod_t: Callable | None = None) -> BPZ:
    """Generic PZ x PZ bilinear product (PZsparse.cu:864-994 semantics).

    k-poly x k-poly products that stay within the basis are tracked exactly
    via the static pair table; everything else is outward-rounded into rad
    exactly where the reference's reduce() would eventually put it.
    """
    dt = a.coef.dtype
    TI = jnp.asarray(basis.pair_i)
    TJ = jnp.asarray(basis.pair_j)
    S = jnp.asarray(basis.scatter, dtype=dt)

    gA = jnp.take(a.coef, TI, axis=-1)          # [..., amat, P]
    gB = jnp.take(b.coef, TJ, axis=-1)          # [..., bmat, P]
    pp = prod(gA, gB)                           # [..., omat, P]
    coef = pp @ S                               # [..., omat, B]
    # sum of |a_i||b_j| over in-table pairs (abs BEFORE any contraction, so
    # legitimate in-basis cancellation is not charged to the radius)
    abs_pair = absprod_t if absprod_t is not None else prod
    in_abs = jnp.sum(abs_pair(jnp.abs(gA), jnp.abs(gB)), axis=-1)  # [..., omat]

    Sa = jnp.sum(jnp.abs(a.coef), axis=-1)
    Sb = jnp.sum(jnp.abs(b.coef), axis=-1)
    overflow = jnp.maximum(absprod(Sa, Sb) - in_abs, 0.0)

    a0 = a.coef[..., 0]
    b0 = b.coef[..., 0]
    E = a.egen.shape[-1]
    egen = prod(a.egen, _bc_last(b0, E)) + prod(_bc_last(a0, E), b.egen)

    Ea = jnp.sum(jnp.abs(a.egen), axis=-1)
    Eb = jnp.sum(jnp.abs(b.egen), axis=-1)
    Ta = Sa + Ea
    Tb = Sb + Eb

    rad = (
        absprod(Ta, b.rad)
        + absprod(a.rad, Tb)
        + absprod(a.rad, b.rad)
        + absprod(Ea, Sb - jnp.abs(b0))
        + absprod(Sa - jnp.abs(a0), Eb)
        + absprod(Ea, Eb)
        + overflow
    )
    if slop:
        rad = rad + slop * (jnp.sum(jnp.abs(coef), axis=-1) + jnp.sum(jnp.abs(egen), axis=-1) + rad)
    return BPZ(coef=coef, egen=egen, rad=rad)


def mul(a: BPZ, b: BPZ, basis: KBasis, slop: float = 0.0) -> BPZ:
    """Elementwise (Hadamard) product with broadcasting."""
    return bilinear(a, b, lambda x, y: x * y, lambda x, y: x * y, basis, slop)


def _matmul_pair(x, y):
    """Unrolled 3x3 (or small) matrix product keeping the huge trailing axis
    innermost: batched-tiny-matmul dot_generals make XLA tile on the size-3
    dims (57x padding blowups measured on v5e); 27 fused elementwise
    multiply-adds on [..., t] slices stay in natural layout."""
    n, m = x.shape[-3], x.shape[-2]
    p = y.shape[-2]
    rows = []
    for i in range(n):
        cols = []
        for k in range(p):
            acc = x[..., i, 0, :] * y[..., 0, k, :]
            for j in range(1, m):
                acc = acc + x[..., i, j, :] * y[..., j, k, :]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def _matmul_abs(x, y):
    n, m = x.shape[-2], x.shape[-1]
    p = y.shape[-1]
    rows = []
    for i in range(n):
        cols = []
        for k in range(p):
            acc = x[..., i, 0] * y[..., 0, k]
            for j in range(1, m):
                acc = acc + x[..., i, j] * y[..., j, k]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def matmul(a: BPZ, b: BPZ, basis: KBasis, slop: float = 0.0) -> BPZ:
    """Matrix product: a [..., n, m, :], b [..., m, p, :] -> [..., n, p, :]."""
    return bilinear(a, b, _matmul_pair, _matmul_abs, basis, slop)


def _matvec_pair(x, y):
    n, m = x.shape[-3], x.shape[-2]
    rows = []
    for i in range(n):
        acc = x[..., i, 0, :] * y[..., 0, :]
        for j in range(1, m):
            acc = acc + x[..., i, j, :] * y[..., j, :]
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _matvec_abs(x, y):
    n, m = x.shape[-2], x.shape[-1]
    rows = []
    for i in range(n):
        acc = x[..., i, 0] * y[..., 0]
        for j in range(1, m):
            acc = acc + x[..., i, j] * y[..., j]
        rows.append(acc)
    return jnp.stack(rows, axis=-1)


def matvec(a: BPZ, v: BPZ, basis: KBasis, slop: float = 0.0) -> BPZ:
    """a [..., n, m, :] @ v [..., m, :] -> [..., n, :]."""
    return bilinear(a, v, _matvec_pair, _matvec_abs, basis, slop)


def _cross_pair(x, y):
    # x, y: [..., 3, t]
    return jnp.stack(
        [
            x[..., 1, :] * y[..., 2, :] - x[..., 2, :] * y[..., 1, :],
            x[..., 2, :] * y[..., 0, :] - x[..., 0, :] * y[..., 2, :],
            x[..., 0, :] * y[..., 1, :] - x[..., 1, :] * y[..., 0, :],
        ],
        axis=-2,
    )


def _cross_abs(x, y):
    return jnp.stack(
        [
            x[..., 1] * y[..., 2] + x[..., 2] * y[..., 1],
            x[..., 2] * y[..., 0] + x[..., 0] * y[..., 2],
            x[..., 0] * y[..., 1] + x[..., 1] * y[..., 0],
        ],
        axis=-1,
    )


def _cross_abs_t(x, y):
    return jnp.stack(
        [
            x[..., 1, :] * y[..., 2, :] + x[..., 2, :] * y[..., 1, :],
            x[..., 2, :] * y[..., 0, :] + x[..., 0, :] * y[..., 2, :],
            x[..., 0, :] * y[..., 1, :] + x[..., 1, :] * y[..., 0, :],
        ],
        axis=-2,
    )


def cross(a: BPZ, b: BPZ, basis: KBasis, slop: float = 0.0) -> BPZ:
    """3-vector cross product (PZsparse.cu:1087-1167)."""
    return bilinear(a, b, _cross_pair, _cross_abs, basis, slop,
                    absprod_t=_cross_abs_t)


def cross_const(m: jnp.ndarray, b: BPZ) -> BPZ:
    """cross(constant vector, PZ vector) — exact, no rounding
    (PZsparse.cu:539-553)."""
    def cr(x, y):
        return jnp.stack(
            [
                x[..., 1, None] * y[..., 2, :] - x[..., 2, None] * y[..., 1, :],
                x[..., 2, None] * y[..., 0, :] - x[..., 0, None] * y[..., 2, :],
                x[..., 0, None] * y[..., 1, :] - x[..., 1, None] * y[..., 0, :],
            ],
            axis=-2,
        )

    mm = jnp.asarray(m)
    coef = cr(mm, b.coef)
    egen = cr(mm, b.egen)
    rad = _cross_abs(jnp.abs(mm), b.rad)
    return BPZ(coef=coef, egen=egen, rad=rad)


def matvec_cvec(a: BPZ, v: jnp.ndarray) -> BPZ:
    """PZ matrix [..., n, m, :] times exact constant vector [..., m] — exact,
    no rounding."""
    vv = jnp.asarray(v)
    coef = jnp.einsum("...ijt,...j->...it", a.coef, vv)
    egen = jnp.einsum("...ijt,...j->...it", a.egen, vv)
    rad = jnp.einsum("...ij,...j->...i", a.rad, jnp.abs(vv))
    return BPZ(coef=coef, egen=egen, rad=rad)


def cross_pz_const(a: BPZ, v: jnp.ndarray) -> BPZ:
    """cross(PZ vector, constant vector) — exact (PZsparse.cu:574-592)."""
    vv = jnp.asarray(v)

    def cr(x):
        return jnp.stack(
            [
                x[..., 1, :] * vv[..., 2, None] - x[..., 2, :] * vv[..., 1, None],
                x[..., 2, :] * vv[..., 0, None] - x[..., 0, :] * vv[..., 2, None],
                x[..., 0, :] * vv[..., 1, None] - x[..., 1, :] * vv[..., 0, None],
            ],
            axis=-2,
        )

    rad = _cross_abs(a.rad, jnp.abs(vv))
    return BPZ(coef=cr(a.coef), egen=cr(a.egen), rad=rad)


def matvec_const(m: jnp.ndarray, b: BPZ) -> BPZ:
    """Exact constant-matrix times PZ vector."""
    mm = jnp.asarray(m)
    coef = jnp.einsum("...ij,...jt->...it", mm, b.coef)
    egen = jnp.einsum("...ij,...jt->...it", mm, b.egen)
    rad = jnp.einsum("...ij,...j->...i", jnp.abs(mm), b.rad)
    return BPZ(coef=coef, egen=egen, rad=rad)


def stack(pzs) -> BPZ:
    """Stack scalar PZs into a vector PZ along a new trailing value axis
    (reference `stack`, PZsparse.cu:508-537)."""
    coef = jnp.stack([p.coef for p in pzs], axis=-2)
    egen = jnp.stack([p.egen for p in pzs], axis=-2)
    rad = jnp.stack([p.rad for p in pzs], axis=-1)
    return BPZ(coef=coef, egen=egen, rad=rad)


def axis_embed(a: BPZ, axis: int, dim: int = 3) -> BPZ:
    """Embed a scalar PZ as a vector PZ with value on `axis`
    (reference addOneDimPZ, PZsparse.cu:489-506)."""
    e = jnp.zeros((dim,), dtype=a.coef.dtype).at[axis].set(1.0)
    return BPZ(
        coef=e[:, None] * a.coef[..., None, :],
        egen=e[:, None] * a.egen[..., None, :],
        rad=e * a.rad[..., None],
    )


def reduce_(a: BPZ) -> BPZ:
    """Move every error generator into the independent radius
    (reference reduce(), PZsparse.cu:352-368: everything not k-only)."""
    return BPZ(
        coef=a.coef,
        egen=jnp.zeros_like(a.egen),
        rad=a.rad + jnp.sum(jnp.abs(a.egen), axis=-1),
    )


def to_interval(a: BPZ):
    """(center, radius) interval hull (PZsparse.cu:557-576)."""
    radius = (
        jnp.sum(jnp.abs(a.coef[..., 1:]), axis=-1)
        + jnp.sum(jnp.abs(a.egen), axis=-1)
        + a.rad
    )
    return a.coef[..., 0], radius


def slice_at(a: BPZ, phi_k: jnp.ndarray):
    """Evaluate k-monomials at a point (PZsparse.cu:404-435).

    phi_k = basis.phi(k), shape [..., B].  Returns (center, radius): the
    sliced center plus the untouched non-k radius.
    """
    c = jnp.einsum("...m,...m->...", a.coef, phi_k)
    r = jnp.sum(jnp.abs(a.egen), axis=-1) + a.rad
    return c, r
