"""Compare build_hyperplanes formulations on TPU (run: python -m benchmarks.hyp_variants)."""
import time, itertools
import numpy as np, jax, jax.numpy as jnp

T, J, O = 128, 8, 40
N = T * J * O
C = 36
COMBS = np.array(list(itertools.combinations(range(9), 2)), dtype=np.int32)

rng = np.random.default_rng(0)
G = jnp.asarray(rng.normal(size=(3, 9, N)).astype(np.float32))
cobs = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))


def timeit(name, fn, *a):
    fn = jax.jit(fn)
    t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
    t1 = time.perf_counter()
    best = 1e9
    for _ in range(5):
        t2 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t2)
    print(f"{name}: compile {t1-t0:.1f}s, run {1e3*best:.3f}ms", flush=True)
    return out


def v_current(G, cobs):
    ga = G[:, COMBS[:, 0], :]
    gb = G[:, COMBS[:, 1], :]
    cr = jnp.cross(ga, gb, axis=0)
    norm = jnp.sqrt(jnp.sum(cr * cr, axis=0, keepdims=True))
    A = jnp.where(norm > 0, cr / jnp.where(norm > 0, norm, 1.0), 0.0)
    delta = jnp.sum(jnp.abs(jnp.einsum("acn,agn->cgn", A, G)), axis=1)
    d = jnp.sum(A * cobs[:, None, :], axis=0)
    return A, d, delta


def v_elemwise(G, cobs):
    ga = G[:, COMBS[:, 0], :]
    gb = G[:, COMBS[:, 1], :]
    cr = jnp.stack([
        ga[1] * gb[2] - ga[2] * gb[1],
        ga[2] * gb[0] - ga[0] * gb[2],
        ga[0] * gb[1] - ga[1] * gb[0],
    ])  # [3, C, N]
    n2 = cr[0] * cr[0] + cr[1] * cr[1] + cr[2] * cr[2]
    inv = jnp.where(n2 > 0, jax.lax.rsqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)
    A = cr * inv[None]
    # delta: [3,C,1,N]*[3,1,9,N] sum over axis0, abs, sum over gens
    AG = A[0][:, None, :] * G[0][None] + A[1][:, None, :] * G[1][None] + A[2][:, None, :] * G[2][None]
    delta = jnp.sum(jnp.abs(AG), axis=1)
    d = A[0] * cobs[0][None] + A[1] * cobs[1][None] + A[2] * cobs[2][None]
    return A, d, delta


def v_unrolled(G, cobs):
    # fully unroll combos in python; each comb works on [N] vectors
    Gs = [[G[a, g] for g in range(9)] for a in range(3)]
    As, ds, deltas = [], [], []
    for (i, j) in COMBS:
        cx = Gs[1][i] * Gs[2][j] - Gs[2][i] * Gs[1][j]
        cy = Gs[2][i] * Gs[0][j] - Gs[0][i] * Gs[2][j]
        cz = Gs[0][i] * Gs[1][j] - Gs[1][i] * Gs[0][j]
        n2 = cx * cx + cy * cy + cz * cz
        inv = jnp.where(n2 > 0, jax.lax.rsqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)
        ax, ay, az = cx * inv, cy * inv, cz * inv
        delta = sum(jnp.abs(ax * Gs[0][g] + ay * Gs[1][g] + az * Gs[2][g]) for g in range(9))
        d = ax * cobs[0] + ay * cobs[1] + az * cobs[2]
        As.append(jnp.stack([ax, ay, az])); ds.append(d); deltas.append(delta)
    return jnp.stack(As, axis=1), jnp.stack(ds), jnp.stack(deltas)


a0 = timeit("current ", v_current, G, cobs)
a1 = timeit("elemwise", v_elemwise, G, cobs)
a2 = timeit("unrolled", v_unrolled, G, cobs)
for nm, a in (("elemwise", a1), ("unrolled", a2)):
    for lbl, x, y in zip(("A", "d", "delta"), a0, a):
        err = float(jnp.max(jnp.abs(x - y)))
        rel = float(jnp.max(jnp.abs(x - y) / (jnp.abs(x) + 1e-3)))
        print(f"{nm} {lbl}: abs {err:.2e} rel {rel:.2e}")

# --- faithful path from frs-shaped inputs (the real build_hyperplanes) ---
shape_gens = jnp.asarray(rng.normal(size=(T, J, 3, 3)).astype(np.float32))
radius = jnp.asarray(rng.normal(size=(T, J, 3)).astype(np.float32))
obs_c = jnp.asarray(rng.normal(size=(O, 3)).astype(np.float32))
obs_g = jnp.asarray(rng.normal(size=(O, 3, 3)).astype(np.float32))

def build_G_current(shape_gens, radius, obs_c, obs_g):
    dt = radius.dtype
    og = jnp.broadcast_to(obs_g[None, None], (T, J, O, 3, 3))
    sg = jnp.broadcast_to(shape_gens[:, :, None], (T, J, O, 3, 3))
    rd = radius[:, :, None, :, None] * jnp.eye(3, dtype=dt)
    rg = jnp.broadcast_to(rd, (T, J, O, 3, 3))
    G = jnp.concatenate([og, sg, rg], axis=-1)
    G = jnp.moveaxis(G.reshape(N, 3, 9), 0, -1)
    cb = jnp.broadcast_to(obs_c.T[:, None, None, :], (3, T, J, O)).reshape(3, 1, N)
    return G, cb[:, 0]

def full_current(shape_gens, radius, obs_c, obs_g):
    G, cb = build_G_current(shape_gens, radius, obs_c, obs_g)
    return v_current(G, cb)

def full_elemwise(shape_gens, radius, obs_c, obs_g):
    G, cb = build_G_current(shape_gens, radius, obs_c, obs_g)
    return v_elemwise(G, cb)

timeit("buildG  ", build_G_current, shape_gens, radius, obs_c, obs_g)
timeit("full_cur", full_current, shape_gens, radius, obs_c, obs_g)
timeit("full_elm", full_elemwise, shape_gens, radius, obs_c, obs_g)

def build_G_rows(shape_gens, radius, obs_c, obs_g):
    # G[a, g, n]: build each of the 27 rows as a flat [N] broadcast; no transpose
    def bc(x):  # x broadcastable to [T, J, O]
        return jnp.broadcast_to(x, (T, J, O)).reshape(N)
    rows = []
    for a in range(3):
        r = []
        for g in range(3):   # obstacle generators: [O]
            r.append(bc(obs_g[None, None, :, a, g]))
        for g in range(3):   # link shape generators: [T, J]
            r.append(bc(shape_gens[:, :, None, a, g]))
        for g in range(3):   # interval radius diag: [T, J] on the diagonal
            r.append(bc(radius[:, :, None, g]) if a == g else jnp.zeros(N, radius.dtype))
        rows.append(jnp.stack(r))
    G = jnp.stack(rows)                       # [3, 9, N]
    cb = jnp.stack([bc(obs_c[None, None, :, a]) for a in range(3)])
    return G, cb

def full_rows(shape_gens, radius, obs_c, obs_g):
    G, cb = build_G_rows(shape_gens, radius, obs_c, obs_g)
    return v_elemwise(G, cb)

gr = timeit("buildGrw", build_G_rows, shape_gens, radius, obs_c, obs_g)
fr = timeit("full_row", full_rows, shape_gens, radius, obs_c, obs_g)
gc = jax.jit(build_G_current)(shape_gens, radius, obs_c, obs_g)
print("G match:", float(jnp.max(jnp.abs(gc[0][:, :6] - gr[0][:, :6]))),
      "(rad cols current)", float(jnp.max(jnp.abs(gc[0][:, 6:] - gr[0][:, 6:]))),
      "cb:", float(jnp.max(jnp.abs(gc[1] - gr[1]))))

def build_G_ojt(shape_gens, radius, obs_c, obs_g):
    # flat order n = (o, j, t): trailing dims (J=8, T=128) are tile-aligned
    sgT = jnp.moveaxis(shape_gens, (0, 1), (3, 2))    # [3, 3, J, T] tiny transpose
    rdT = jnp.moveaxis(radius, (0, 1), (2, 1))        # [3, J, T]
    def bc(x):  # x broadcastable to [O, J, T]
        return jnp.broadcast_to(x, (O, J, T)).reshape(N)
    z = jnp.zeros(N, radius.dtype)
    rows = []
    for a in range(3):
        r = []
        for g in range(3):
            r.append(bc(obs_g[:, a, g][:, None, None]))
        for g in range(3):
            r.append(bc(sgT[a, g][None]))
        for g in range(3):
            r.append(bc(rdT[g][None]) if a == g else z)
        rows.append(jnp.stack(r))
    G = jnp.stack(rows)
    cb = jnp.stack([bc(obs_c[:, a][:, None, None]) for a in range(3)])
    return G, cb

def full_ojt(shape_gens, radius, obs_c, obs_g):
    G, cb = build_G_ojt(shape_gens, radius, obs_c, obs_g)
    return v_elemwise(G, cb)

timeit("buildOJT", build_G_ojt, shape_gens, radius, obs_c, obs_g)
timeit("full_ojt", full_ojt, shape_gens, radius, obs_c, obs_g)
# correctness: compare against current layout via permutation
go = jax.jit(build_G_ojt)(shape_gens, radius, obs_c, obs_g)
gc2 = jax.jit(build_G_current)(shape_gens, radius, obs_c, obs_g)
perm = (np.arange(N).reshape(T, J, O).transpose(2, 1, 0)).reshape(N)
print("OJT G match:", float(jnp.max(jnp.abs(gc2[0][:, :, perm] - go[0]))),
      "cb:", float(jnp.max(jnp.abs(gc2[1][:, perm] - go[1]))))

print("--- bisect ---")
timeit("noop_big", lambda g: g + 1.0, G)                      # [3,9,N] elementwise
timeit("one_bc  ", lambda og: jnp.broadcast_to(og[:, 0, 0][:, None, None], (O, J, T)).reshape(N) + 0.0, obs_g)
timeit("stack27z", lambda x: jnp.stack([jnp.stack([x + float(i * 3 + a) for i in range(9)]) for a in range(3)]), jnp.zeros(N))
timeit("27bc_nostack", lambda og: sum(jnp.broadcast_to(og[:, a, g][:, None, None], (O, J, T)).reshape(N) for a in range(3) for g in range(3)), obs_g)
