"""Round-5 probe: sparse_wide (40k x 10k @1%) matvec route comparison.

The r5 CLI cell is 24.9 ms vs 7.0 ms scipy (0.28x).  Candidate routes:
- current class routing (whatever SparseMatrix picks),
- csr_matvec_pg (lane-shuffle nnz gather + f64 cumsum + boundary takes),
- csr_matvec (XLA takes throughout),
- wide int8-plane plan (sparse_wide.wide_matvec).

Usage (TPU): python docs/probes/r5_wide_matvec_probe.py
"""

import os
import sys
import timeit

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sps

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import tabmat_tpu as tm  # noqa: E402
from tabmat_tpu.bench import main as bm  # noqa: E402
from tabmat_tpu.ops import sparse_ops  # noqa: E402


def marginal_route(label, fn, x0):
    dt = bm._marginal_device(fn, x0)
    print(f"  {label}: {dt*1e3:.3f} ms", flush=True)
    return dt


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    n, k = 40_000, 10_000
    X = sps.random(n, k, density=0.01, random_state=7, format="csc",
                   dtype=np.float64)
    m = tm.SparseMatrix(X)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(k)
    host = min(timeit.repeat(lambda: X @ v, number=5, repeat=3)) / 5
    print(f"scipy: {host*1e3:.3f} ms", flush=True)

    # class routing
    step, x0 = bm._get_chain_step(m, "matvec")
    marginal_route("class route", step, x0)

    # explicit routes, same chaining shape as the CLI
    data, col_idx, row_bounds = m._csr_parts()
    cols2d = m._pallas_cols2d(jnp.float64)
    tile = n // k + 1
    fold = jax.jit(lambda o: jnp.tile(o * 0.1, (k // n + 1))[:k])

    vd = jnp.asarray(v)
    if cols2d is not None:
        marginal_route(
            "csr_matvec_pg",
            lambda x: fold(sparse_ops.csr_matvec_pg(data, cols2d, row_bounds, x)),
            vd,
        )
    marginal_route(
        "csr_matvec (XLA takes)",
        lambda x: fold(sparse_ops.csr_matvec(data, col_idx, row_bounds, x)),
        vd,
    )
    wplan = m._wide_matvec_plan()
    if wplan is not None:
        from tabmat_tpu.ops import sparse_wide

        marginal_route(
            "wide int8 planes",
            lambda x: fold(sparse_wide.wide_matvec(wplan, x)),
            vd,
        )
