"""Round-5 probe: v4 sandwich grid-step size (SUB) and flush cadence.

The round-4 kernel runs 245 grid steps × 10 anti-diagonal int8 dots at
1M×50; the builder's probes blamed ~40% per-dot overhead.  Raising SUB
halves the step count (same HBM stream, same MXU MACs, fewer dot
launches) at the cost of a bigger A-stack scratch.  This probe rebuilds
the cache and re-times the sandwich for each SUB, patching the module
constant (the B-stack layout is SUB-interleaved, so the cache must be
rebuilt per setting).

Usage (TPU, relay idle): python docs/probes/r5_v4_sub_probe.py [SUB ...]
Defaults: 2048 4096.
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


def time_sub(X, d, SUB, flush=None):
    v4.SUB = SUB
    if flush is not None:
        v4.FLUSH_EVERY = flush
    t0 = time.time()
    # row_multiple's default binds at def time — pass the patched SUB
    cache = v4.build_plane_cache(X, row_multiple=SUB)
    jax.block_until_ready(cache.bstk)
    t_build = time.time() - t0

    ref = (np.asarray(X).T * np.asarray(d)) @ np.asarray(X)
    out = np.asarray(v4.sandwich_from_cache(cache, jnp.asarray(d)))
    err = float(np.max(np.abs(out - ref)) / np.max(np.abs(ref)))

    def step(dd):
        return dd * (1.0 + 1e-9 * jnp.ravel(
            v4.sandwich_from_cache(cache, dd))[0])

    t = bm._marginal_device(step, jnp.asarray(d))
    print(f"SUB={SUB} flush={v4.FLUSH_EVERY}: {t*1e3:.3f} ms "
          f"(build {t_build:.1f}s, relerr {err:.1e})", flush=True)
    return t


if __name__ == "__main__":
    subs = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    n, k = 1_000_000, 50
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, k)) * np.exp(
        rng.uniform(-4, 4, (1, k))))
    d = rng.random(n)
    print(jax.devices(), flush=True)
    for SUB in subs:
        time_sub(X, d, SUB)
