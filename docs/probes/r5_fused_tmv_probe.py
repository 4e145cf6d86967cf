"""Round-5 hardware probe: fused tmv kernel vs round-4 routes.

Usage (TPU): TABMAT_TPU_FUSED_TMV=1 python docs/probes/r5_fused_tmv_probe.py
Measures the chained-marginal device cost of SparseMatrix.transpose_matvec
on the benchmark designs, plus correctness vs scipy.  Flip the env off to
measure the round-4 routes on the same protocol.
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


def bench_design(name, n, k, density):
    rng = np.random.default_rng(7)
    X = sps.random(n, k, density=density, random_state=7, format="csc",
                   dtype=np.float64)
    m = tm.SparseMatrix(X)
    v = rng.standard_normal(n)
    ref = X.T @ v
    scale = np.abs(X.T) @ np.abs(v) + 1e-300

    fused_ok = m._fused_tmv_parts(jnp.float64) is not None
    out = np.asarray(m.transpose_matvec(jnp.asarray(v)))
    err = float(np.max(np.abs(out - ref) / scale))

    step, x0 = bm._get_chain_step(m, "transpose-matvec")
    dt = bm._marginal_device(step, x0)
    host = min(timeit.repeat(lambda: X.T @ v, number=5, repeat=3)) / 5
    print(f"{name}: fused_plan={fused_ok} t={dt*1e3:.3f} ms "
          f"scipy={host*1e3:.3f} ms ({host/dt:.2f}x) relerr={err:.2e}",
          flush=True)


if __name__ == "__main__":
    print(jax.devices(), os.environ.get("TABMAT_TPU_FUSED_TMV"), flush=True)
    bench_design("sparse 400k x 100 @1%", 400_000, 100, 0.01)
    bench_design("sparse_narrow 3M x 3 @1%", 3_000_000, 3, 0.01)
    bench_design("mid 1M x 300 @0.5%", 1_000_000, 300, 0.005)
