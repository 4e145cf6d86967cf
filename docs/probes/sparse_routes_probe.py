"""Sparse route microbench with chained-marginal timing (memoization-proof)."""

import functools
import time

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

import tabmat_tpu as tm
from tabmat_tpu.ops import pallas_sandwich_v4 as v4
from tabmat_tpu.ops import ozaki, sparse_ops

print = functools.partial(print, flush=True)

rng = np.random.default_rng(0)
n, k, density = 400_000, 100, 0.01
A = sps.random(n, k, density=density, format="csc", random_state=123, dtype=np.float64)
sm = tm.SparseMatrix(A)
v0 = jnp.asarray(rng.standard_normal(k))
r0 = jnp.asarray(rng.standard_normal(n))

K1 = 3
seed_ctr = [500]


def marginal(tag, step, x0):
    def run(K):
        seed_ctr[0] += 1
        x = x0 * (1.0 + jnp.float64(seed_ctr[0]) * 1e-9)
        t0 = time.perf_counter()
        for _ in range(K):
            x = step(x)
        np.asarray(jnp.ravel(x)[0])
        return time.perf_counter() - t0

    run(2)
    for K2 in (K1 + 10, K1 + 40, K1 + 160):
        best = float("inf")
        for _ in range(2):
            t1 = run(K1)
            t2 = run(K2)
            best = min(best, (t2 - t1) / (K2 - K1))
        if best * (K2 - K1) >= 0.025:
            break
    print(f"{tag:26s} {best*1e3:8.3f} ms")
    return best


# class routes as-is
marginal("class matvec", lambda v: v * (1.0 + jnp.abs(sm.matvec(v)[0]) * 1e-30), v0)
marginal("class tmv", lambda r: r * (1.0 + jnp.abs(sm.transpose_matvec(r)[0]) * 1e-30), r0)

# windowed routes explicitly
wmv = sm._window_matvec_parts(jnp.float64)
data_csr, col_idx, row_bounds = sm._csr_parts()
if wmv is not None:
    bcodes2d, bws, W, colref, use_pg = wmv
    marginal(
        "window matvec",
        lambda v: v * (1.0 + jnp.abs(sparse_ops.csr_matvec_window(
            data_csr, colref, bcodes2d, bws, v, int(A.nnz), n, W, use_pg)[0]) * 1e-30),
        v0,
    )
wtmv = sm._window_tmv_parts(jnp.float64)
if wtmv is not None:
    rcodes2d, rws, W2, col_codes = wtmv
    marginal(
        "window tmv",
        lambda r: r * (1.0 + jnp.abs(sparse_ops.csr_tmv_window(
            data_csr, rcodes2d, rws, col_codes, r, int(A.nnz), k, W2)[0]) * 1e-30),
        r0,
    )

# pg routes
cols2d = sm._pallas_cols2d(jnp.float64)
if cols2d is not None:
    marginal(
        "pg matvec",
        lambda v: v * (1.0 + jnp.abs(sparse_ops.csr_matvec_pg(
            data_csr, cols2d, row_bounds, v)[0]) * 1e-30),
        v0,
    )
rows2d = sm._pallas_rows2d(jnp.float64)
data_csc, row_idx, col_bounds = sm._csc_parts()
if rows2d is not None:
    marginal(
        "pg tmv",
        lambda r: r * (1.0 + jnp.abs(sparse_ops.csc_rmatvec_pg(
            data_csc, rows2d, col_bounds, r)[0]) * 1e-30),
        r0,
    )

# dense-mirror routes
mirror = sm._mirror_ozaki_caches()
print("mirror caches:", None if mirror is None else len(mirror))
if mirror is not None:
    marginal(
        "mirror ozaki tmv",
        lambda r: r * (1.0 + jnp.abs(ozaki.transpose_matvec_cached(
            mirror[0], mirror[1], r)[0]) * 1e-30),
        r0,
    )
    marginal(
        "mirror ozaki matvec",
        lambda v: v * (1.0 + jnp.abs(ozaki.matvec_cached_T(
            mirror[2], mirror[3], v, n=n)[0]) * 1e-30),
        v0,
    )
plane = sm._mirror_plane_cache()
print("mirror plane cache:", type(plane).__name__)
if isinstance(plane, v4.PlaneCacheV4):
    got = v4.tmv_from_cache(plane, r0)
    ref = A.T @ np.asarray(r0)
    print("v4 tmv relerr", np.abs(np.asarray(got) - ref).max() / np.abs(ref).max())
    marginal(
        "mirror v4 tmv",
        lambda r: r * (1.0 + jnp.abs(v4._tmv_v4_jit(
            plane.bstk, plane.exps, r, plane.n, plane.k, plane.G)[0]) * 1e-30),
        r0,
    )

# CPU baselines (host loop, no memoization concern)
csr = A.tocsr()
vh = np.asarray(v0)
rh = np.asarray(r0)
t0 = time.time()
for _ in range(30):
    csr @ vh
print(f"{'scipy matvec':26s} {(time.time()-t0)/30*1e3:8.3f} ms")
t0 = time.time()
for _ in range(30):
    csr.T @ rh
print(f"{'scipy tmv':26s} {(time.time()-t0)/30*1e3:8.3f} ms")
