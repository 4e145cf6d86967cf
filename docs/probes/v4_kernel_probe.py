"""v4 full-op + tmv measurement after the transposed-d restructure."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import tabmat_tpu  # noqa: F401
from tabmat_tpu.ops import pallas_sandwich_v4 as v4
from tabmat_tpu.ops import ozaki

print = functools.partial(print, flush=True)

rng = np.random.default_rng(0)
n, k = 1_000_000, 50
X = jnp.asarray(rng.standard_normal((n, k)))
d0 = jnp.asarray(rng.random(n))
r0 = jnp.asarray(rng.standard_normal(n))

cache = v4.build_plane_cache(X)
jax.block_until_ready(cache.bstk)
print("cache ready")

# correctness on hardware first
S = v4._sandwich_v4_jit(cache.xsh, cache.xsl, cache.bstk, cache.exps, d0,
                        cache.n, cache.k, cache.G)
ref = (np.asarray(X) * np.asarray(d0)[:, None]).T @ np.asarray(X)
relerr = np.abs(np.asarray(S) - ref).max() / np.abs(ref).max()
print("sandwich relerr", relerr)
got = v4._tmv_v4_jit(cache.bstk, cache.exps, r0, cache.n, cache.k, cache.G)
reft = np.asarray(X).T @ np.asarray(r0)
print("tmv relerr", np.abs(np.asarray(got) - reft).max() / np.abs(reft).max())

K1 = 3
seed_ctr = [700]


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
    best = float("inf")
    for K2 in (K1 + 10, K1 + 40, K1 + 160):
        best = float("inf")
        for _ in range(2):
            t1 = run(K1)
            t2 = run(K2)
            best = min(best, (t2 - t1) / (K2 - K1))
        if best * (K2 - K1) >= 0.025:
            break
    print(f"{tag:22s} {best*1e3:8.3f} ms")
    return best


marginal(
    "full sandwich",
    lambda d: d * (1.0 + jnp.abs(v4._sandwich_v4_jit(
        cache.xsh, cache.xsl, cache.bstk, cache.exps, d,
        cache.n, cache.k, cache.G)[0, 0]) * 1e-30),
    d0,
)
prep = jax.jit(v4._v4_prep, static_argnames=("n", "k", "G", "pallas_max", "interpret"))
marginal(
    "prep (pallas max)",
    lambda d: d * (1.0 + jnp.abs(
        prep(cache.xsh, d, cache.n, cache.k, cache.G)[0][0, 0]
    ).astype(jnp.float64) * 1e-30),
    d0,
)
marginal(
    "tmv_from_cache",
    lambda r: r * (1.0 + jnp.abs(v4._tmv_v4_jit(
        cache.bstk, cache.exps, r, cache.n, cache.k, cache.G)[0]) * 1e-30),
    r0,
)
oz = ozaki.slice_matrix(X)
marginal(
    "tmv ozaki (old)",
    lambda r: r * (1.0 + jnp.abs(
        ozaki.transpose_matvec_cached(oz[0], oz[1], r)[0]) * 1e-30),
    r0,
)
