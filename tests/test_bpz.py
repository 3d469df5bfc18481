"""Unit tests for the dense BPZ algebra against the sparse oracle and
Monte-Carlo containment (SURVEY.md section 4 test pyramid, level i)."""

import numpy as np
import jax.numpy as jnp
import pytest

from armour_tpu.pz import basis as basis_mod
from armour_tpu.pz import bpz
from armour_tpu.pz.basis import error_layout
from armour_tpu.pz.oracle import SparsePZ

NF = 7
BASIS = basis_mod.make_basis(NF, 3)
LAY = error_layout(NF)
E = LAY["size"]
RNG = np.random.default_rng(0)


def _egen_slot(group, i):
    return LAY[group].start + i


def random_pair(rng, shape=()):
    """Build a random scalar PZ in both representations."""
    center = rng.normal()
    # a few k monomials within the basis
    terms = []
    coef = np.zeros(BASIS.size)
    coef[0] = center
    for _ in range(4):
        m = rng.integers(1, BASIS.size)
        c = rng.normal()
        coef[m] += c
        degs = {("k", i): int(d) for i, d in enumerate(BASIS.degs[m]) if d}
        terms.append((c, degs))
    egen = np.zeros(E)
    for group in ("qde", "cosqe", "sinqe"):
        i = int(rng.integers(0, NF))
        c = rng.normal() * 0.1
        egen[_egen_slot(group, i)] += c
        terms.append((c, {(group, i): 1}))
    rad = abs(rng.normal() * 0.05)
    dense = bpz.BPZ(coef=jnp.asarray(coef), egen=jnp.asarray(egen), rad=jnp.asarray(rad))
    sparse = SparsePZ.from_terms(np.array(center), terms, np.array(rad))
    return dense, sparse


def k_poly_from_sparse(sp: SparsePZ):
    coef = np.zeros(BASIS.size)
    coef[0] = float(sp.center)
    for key, v in sp.poly.items():
        if all(var[0] == "k" for var, _ in key):
            d = [0] * NF
            for (g, i), e in key:
                d[i] = e
            if sum(d) <= BASIS.max_degree:
                coef[BASIS.index[tuple(d)]] += float(v)
    return coef


def test_add_matches_oracle():
    a_d, a_s = random_pair(RNG)
    b_d, b_s = random_pair(RNG)
    out = bpz.add(a_d, b_d)
    ref = a_s + b_s
    np.testing.assert_allclose(np.asarray(out.coef), k_poly_from_sparse(ref), atol=1e-12)
    np.testing.assert_allclose(float(out.rad), float(ref.indep), atol=1e-12)


def test_mul_kpoly_matches_oracle():
    a_d, a_s = random_pair(RNG)
    b_d, b_s = random_pair(RNG)
    out = bpz.mul(a_d, b_d, BASIS)
    ref = a_s * b_s
    # k-only coefficients within the basis must match exactly
    ref_coef = k_poly_from_sparse(ref)
    np.testing.assert_allclose(np.asarray(out.coef), ref_coef, atol=1e-10)
    # dense radius must dominate the oracle's post-reduce radius (conservatism)
    ref_r = ref.copy()
    ref_r.reduce()
    _, ref_interval_r = ref_r.to_interval()
    _, out_interval_r = bpz.to_interval(out)
    # oracle may keep deg-4+ k monomials symbolically; compare interval hulls
    assert float(out_interval_r) >= float(ref_interval_r) - 1e-10


def test_mul_containment_montecarlo():
    """Random samples of the product set must lie within the dense interval
    hull — the invariant everything relies on (SURVEY.md section 4)."""
    rng = np.random.default_rng(3)
    for _ in range(10):
        a_d, a_s = random_pair(rng)
        b_d, b_s = random_pair(rng)
        out = bpz.mul(a_d, b_d, BASIS)
        c, r = bpz.to_interval(out)
        c, r = float(c), float(r)
        for _ in range(200):
            kvec = rng.uniform(-1, 1, NF)
            xa = float(a_s.sample(rng, kvec))
            xb = float(b_s.sample(rng, kvec))
            assert c - r - 1e-9 <= xa * xb <= c + r + 1e-9


def test_slice_matches_polyval():
    a_d, a_s = random_pair(RNG)
    kvec = RNG.uniform(-1, 1, NF)
    phi = BASIS.phi(jnp.asarray(kvec))
    c, r = bpz.slice_at(a_d, phi)
    c_ref, r_ref = a_s.slice_at(kvec)
    np.testing.assert_allclose(float(c), float(c_ref), atol=1e-10)
    np.testing.assert_allclose(float(r), float(r_ref), atol=1e-10)


def test_matmul_matches_oracle():
    rng = np.random.default_rng(7)
    # random 3x3 matrix PZs with k-linear + error entries
    def rand_mat():
        coef = np.zeros((3, 3, BASIS.size))
        coef[..., 0] = rng.normal(size=(3, 3))
        m = int(rng.integers(1, 8))
        kmat = rng.normal(size=(3, 3))
        coef[..., m] = kmat
        egen = np.zeros((3, 3, E))
        s = _egen_slot("cosqe", 2)
        emat = rng.normal(size=(3, 3)) * 0.01
        egen[..., s] = emat
        rad = np.abs(rng.normal(size=(3, 3))) * 0.01
        dense = bpz.BPZ(jnp.asarray(coef), jnp.asarray(egen), jnp.asarray(rad))
        degs = {("k", i): int(d) for i, d in enumerate(BASIS.degs[m]) if d}
        sparse = SparsePZ.from_terms(coef[..., 0], [(kmat, degs), (emat, {("cosqe", 2): 1})], rad)
        return dense, sparse

    a_d, a_s = rand_mat()
    b_d, b_s = rand_mat()
    out = bpz.matmul(a_d, b_d, BASIS)
    ref = a_s * b_s
    np.testing.assert_allclose(
        np.asarray(out.coef[..., 0]), ref.center, atol=1e-10
    )
    # compare interval hulls entrywise: dense must contain oracle's
    oc, orad = ref.to_interval()
    dc, drad = bpz.to_interval(out)
    np.testing.assert_allclose(np.asarray(dc), oc, atol=1e-9)
    assert np.all(np.asarray(drad) >= orad - 1e-9)


def test_cross_matches_oracle():
    rng = np.random.default_rng(11)
    def rand_vec():
        coef = np.zeros((3, BASIS.size))
        coef[..., 0] = rng.normal(size=3)
        kv = rng.normal(size=3)
        coef[..., 4] = kv
        egen = np.zeros((3, E))
        rad = np.abs(rng.normal(size=3)) * 0.02
        dense = bpz.BPZ(jnp.asarray(coef), jnp.asarray(egen), jnp.asarray(rad))
        degs = {("k", i): int(d) for i, d in enumerate(BASIS.degs[4]) if d}
        sparse = SparsePZ.from_terms(coef[..., 0], [(kv, degs)], rad)
        return dense, sparse

    a_d, a_s = rand_vec()
    b_d, b_s = rand_vec()
    out = bpz.cross(a_d, b_d, BASIS)
    ref = a_s.cross(b_s)
    oc, orad = ref.to_interval()
    dc, drad = bpz.to_interval(out)
    np.testing.assert_allclose(np.asarray(dc), oc, atol=1e-9)
    assert np.all(np.asarray(drad) >= orad - 1e-9)


def test_phi_dphi():
    k = jnp.asarray(RNG.uniform(-1, 1, NF))
    phi = np.asarray(BASIS.phi(k))
    for m, d in enumerate(BASIS.degs):
        expect = np.prod(np.asarray(k) ** d)
        np.testing.assert_allclose(phi[m], expect, rtol=1e-10)
    # dphi vs finite differences
    dphi = np.asarray(BASIS.dphi(k))
    eps = 1e-6
    for j in range(NF):
        kp = np.asarray(k).copy(); kp[j] += eps
        km = np.asarray(k).copy(); km[j] -= eps
        fd = (np.asarray(BASIS.phi(jnp.asarray(kp))) - np.asarray(BASIS.phi(jnp.asarray(km)))) / (2 * eps)
        np.testing.assert_allclose(dphi[:, j], fd, atol=1e-6)


def test_structured_operand_fast_paths_match_generic():
    """mul_interval / matmul_interval / matmul_linear(+right) /
    matvec_const_coef must reproduce the generic bilinear EXACTLY on
    operands with the structure they assume (interval-only inertial params,
    degree<=1 rotations, constant-coef link boxes)."""
    import numpy as np

    from armour_tpu.pz import bpz
    from armour_tpu.pz.basis import error_layout, make_basis

    basis = make_basis(7, 3)
    B = basis.size
    E = error_layout(7)["size"]
    rng = np.random.default_rng(3)

    def lin_mat(shape):
        coef = np.zeros(shape + (B,))
        coef[..., 0] = rng.normal(size=shape)
        for li in basis.lin_idx:
            coef[..., li] = 0.1 * rng.normal(size=shape)
        return bpz.BPZ(coef=jnp.asarray(coef),
                       egen=jnp.asarray(0.01 * rng.normal(size=shape + (E,))),
                       rad=jnp.asarray(np.abs(0.01 * rng.normal(size=shape))))

    def gen_pz(shape, scale=0.2):
        return bpz.BPZ(coef=jnp.asarray(scale * rng.normal(size=shape + (B,))),
                       egen=jnp.asarray(0.02 * rng.normal(size=shape + (E,))),
                       rad=jnp.asarray(np.abs(0.02 * rng.normal(size=shape))))

    def close(a, b):
        np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.egen), np.asarray(b.egen),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.rad), np.asarray(b.rad),
                                   atol=1e-12)

    a_lin = lin_mat((4, 3, 3))
    b = gen_pz((4, 3, 2))
    close(bpz.matmul_linear(a_lin, b, basis),
          bpz.matmul(a_lin, b, basis))

    a_gen = gen_pz((4, 3, 3))
    close(bpz.matmul_linear_right(a_gen, _as_mat(a_lin), basis),
          bpz.matmul(a_gen, _as_mat(a_lin), basis))

    # interval-only operand (mass/inertia): coef at const + rad
    c = rng.normal(size=(4, 1, 1))
    r = np.abs(0.03 * rng.normal(size=(4, 1, 1)))
    iv = bpz.from_interval(jnp.asarray(c), jnp.asarray(r), basis)
    close(bpz.mul_interval(jnp.asarray(c), jnp.asarray(r), b),
          bpz.mul(iv, b, basis))


    # interval MATRIX operand (inertia): coef at const + rad
    C = rng.normal(size=(4, 3, 3))
    R = np.abs(0.02 * rng.normal(size=(4, 3, 3)))
    ivm = bpz.from_interval(jnp.asarray(C), jnp.asarray(R), basis)
    close(bpz.matmul_interval(jnp.asarray(C), jnp.asarray(R), b),
          bpz.matmul(ivm, b, basis))

    # constant-coef + egen vector (link box)
    box = bpz.BPZ(
        coef=jnp.asarray(np.zeros((4, 3, B))).at[..., 0].set(
            jnp.asarray(rng.normal(size=(4, 3)))),
        egen=jnp.asarray(0.05 * rng.normal(size=(4, 3, E))),
        rad=jnp.asarray(np.abs(0.01 * rng.normal(size=(4, 3)))),
    )
    close(bpz.matvec_const_coef(a_gen, box),
          bpz.matvec(a_gen, box, basis))


def _as_mat(p):
    return p
