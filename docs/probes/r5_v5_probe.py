"""Round-5 probe: v5 all-pairs single-dot sandwich vs the v4 kernel.

Times both kernels' chained-marginal sandwich cost at the 1M×50 BENCH
shape, plus the shared-cache tmv, with hardware relerr checks.  The v5
design replaces v4's 10 windowed anti-diagonal dots per grid step with
ONE (SUB, NP·kpad)ᵀ·(SUB, NP·kpad) int8 dot (all 64 plane pairs kept —
no truncation), targeting the ~40% per-dot overhead v4's probes
measured.

Usage (TPU, relay idle): python docs/probes/r5_v5_probe.py [n k]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tabmat_tpu.bench import main as bm  # noqa: E402
from tabmat_tpu.ops import pallas_sandwich_v4 as v4  # noqa: E402
from tabmat_tpu.ops import pallas_sandwich_v5 as v5  # noqa: E402


def time_mod(mod, name, X, d, r):
    t0 = time.time()
    cache = mod.build_plane_cache(X)
    jax.block_until_ready(cache.bstk)
    t_build = time.time() - t0

    ref = (np.asarray(X).T * np.asarray(d)) @ np.asarray(X)
    out = np.asarray(mod.sandwich_from_cache(cache, jnp.asarray(d)))
    err = float(np.max(np.abs(out - ref)) / np.max(np.abs(ref)))

    def step(dd):
        return dd * (1.0 + 1e-9 * jnp.ravel(mod.sandwich_from_cache(cache, dd))[0])

    t = bm._marginal_device(step, jnp.asarray(d))
    print(
        f"{name} sandwich: {t*1e3:.3f} ms (build {t_build:.1f}s, relerr {err:.1e})",
        flush=True,
    )

    tref = np.asarray(X).T @ np.asarray(r)
    tout = np.asarray(mod.tmv_from_cache(cache, jnp.asarray(r)))
    terr = float(np.max(np.abs(tout - tref)) / np.max(np.abs(tref)))

    def tstep(rr):
        return rr * (1.0 + 1e-9 * jnp.sum(mod.tmv_from_cache(cache, rr)))

    tt = bm._marginal_device(tstep, jnp.asarray(r))
    print(f"{name} tmv:      {tt*1e3:.3f} ms (relerr {terr:.1e})", flush=True)
    return t, tt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rng = np.random.default_rng(0)
    X = jnp.asarray(
        rng.standard_normal((n, k)) * np.exp(rng.uniform(-4, 4, (1, k)))
    )
    d = rng.random(n)
    r = rng.standard_normal(n)
    print(jax.devices(), f"n={n} k={k}", flush=True)
    time_mod(v5, "v5", X, d, r)
    time_mod(v4, "v4", X, d, r)
