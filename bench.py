"""Driver benchmark: GLM core ops (sandwich / matvec / transpose-matvec).

Measures tabmat-tpu on the real device against CPU numpy/scipy equivalents —
the same competitors the reference benchmarks against
(``/root/reference/src/tabmat/benchmark/main.py:58-62``; the reference
publishes no absolute numbers, see BASELINE.md).

Configs follow BASELINE.json: dense 1M×50 fp64, categorical 1M rows × 10k
categories, sparse 400k×100 @1% density.  Timing protocol mirrors the
reference CLI: min over iterations with ``block_until_ready``.

Prints ONE JSON line:
  {"metric": ..., "value": <geomean ms over ops>, "unit": "ms",
   "vs_baseline": <geomean speedup vs numpy/scipy on this host>}
"""

import json
import time

import numpy as np


def _timeit(fn, n_iter=20, warmup=2):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from scipy import sparse as sps

    import tabmat_tpu as tm

    rng = np.random.default_rng(0)
    results = {}  # name -> (ours_sec, baseline_sec)

    # ---------------- dense 1M x 50 fp64 ----------------
    n, k = 1_000_000, 50
    X_np = rng.standard_normal((n, k))
    d_np = rng.random(n)
    v_np = rng.standard_normal(k)
    vr_np = rng.standard_normal(n)

    dm = tm.DenseMatrix(X_np)
    d_dev, v_dev, vr_dev = jnp.asarray(d_np), jnp.asarray(v_np), jnp.asarray(vr_np)

    results["dense_sandwich"] = (
        _timeit(lambda: jax.block_until_ready(dm.sandwich(d_dev))),
        _timeit(lambda: (X_np * d_np[:, None]).T @ X_np, n_iter=5),
    )
    results["dense_matvec"] = (
        _timeit(lambda: jax.block_until_ready(dm.matvec(v_dev))),
        _timeit(lambda: X_np @ v_np, n_iter=5),
    )
    results["dense_tmv"] = (
        _timeit(lambda: jax.block_until_ready(dm.transpose_matvec(vr_dev))),
        _timeit(lambda: X_np.T @ vr_np, n_iter=5),
    )

    # ---------------- categorical 1M x 10k ----------------
    ncat = 10_000
    codes = rng.integers(0, ncat, n).astype(np.int32)
    cm = tm.CategoricalMatrix(codes, categories=np.arange(ncat))
    cm.plan  # build the segment plan outside the timed region (cached)
    C_csr = sps.csr_matrix(
        (np.ones(n), codes, np.arange(n + 1)), shape=(n, ncat)
    )
    C_csc = C_csr.tocsc()
    vc_np = rng.standard_normal(ncat)
    vc_dev = jnp.asarray(vc_np)

    results["cat_sandwich"] = (
        _timeit(lambda: jax.block_until_ready(cm.sandwich(d_dev).diag)),
        _timeit(lambda: (C_csr.multiply(d_np[:, None]).T @ C_csr), n_iter=3),
    )
    results["cat_matvec"] = (
        _timeit(lambda: jax.block_until_ready(cm.matvec(vc_dev))),
        _timeit(lambda: C_csr @ vc_np, n_iter=5),
    )
    results["cat_tmv"] = (
        _timeit(lambda: jax.block_until_ready(cm.transpose_matvec(vr_dev))),
        _timeit(lambda: C_csc.T @ vr_np, n_iter=5),
    )

    # ---------------- sparse 400k x 100 @ 1% ----------------
    ns, ks = 400_000, 100
    S = sps.random(ns, ks, density=0.01, random_state=0, format="csc")
    S_csr = S.tocsr()
    sm = tm.SparseMatrix(S)
    sm._csr_parts(), sm._csc_parts(), sm._dense_mirror()
    ds_np = rng.random(ns)
    vs_np = rng.standard_normal(ks)
    vrs_np = rng.standard_normal(ns)
    ds_dev, vs_dev, vrs_dev = jnp.asarray(ds_np), jnp.asarray(vs_np), jnp.asarray(vrs_np)

    results["sparse_sandwich"] = (
        _timeit(lambda: jax.block_until_ready(sm.sandwich(ds_dev))),
        _timeit(lambda: (S.T @ S.multiply(ds_np[:, None])).toarray(), n_iter=3),
    )
    results["sparse_matvec"] = (
        _timeit(lambda: jax.block_until_ready(sm.matvec(vs_dev))),
        _timeit(lambda: S_csr @ vs_np, n_iter=5),
    )
    results["sparse_tmv"] = (
        _timeit(lambda: jax.block_until_ready(sm.transpose_matvec(vrs_dev))),
        _timeit(lambda: S.T @ vrs_np, n_iter=5),
    )

    ours = np.array([v[0] for v in results.values()])
    base = np.array([v[1] for v in results.values()])
    geo_ms = float(np.exp(np.mean(np.log(ours))) * 1e3)
    speedup = float(np.exp(np.mean(np.log(base / ours))))

    detail = {
        name: {"tabmat_tpu_ms": round(o * 1e3, 4), "cpu_baseline_ms": round(b * 1e3, 4)}
        for name, (o, b) in results.items()
    }
    print(
        json.dumps(
            {
                "metric": "glm_core_ops_geomean_wallclock (dense 1Mx50 fp64, "
                "cat 1Mx10k, sparse 400kx100; sandwich+matvec+tmv)",
                "value": round(geo_ms, 4),
                "unit": "ms",
                "vs_baseline": round(speedup, 4),
                "detail": detail,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
