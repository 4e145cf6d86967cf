"""Driver benchmark: GLM core ops (sandwich / matvec / transpose-matvec).

Measures tabmat-tpu on the real device against CPU numpy/scipy equivalents —
the same competitors the reference benchmarks against
(``/root/reference/src/tabmat/benchmark/main.py:58-62``; the reference
publishes no absolute numbers, see BASELINE.md).

Configs follow BASELINE.json: dense 1M×50 fp64, categorical 1M rows × 10k
categories, sparse 400k×100 @1% density.  Timing protocol: min over
iterations with ``block_until_ready`` per call, rotating a ring of distinct
pre-uploaded operand vectors (the remote execution path memoizes identical
requests, so repeating one input under-reports).

Prints ONE JSON line:
  {"metric": ..., "value": <geomean ms over ops>, "unit": "ms",
   "vs_baseline": <geomean speedup vs numpy/scipy on this host>}
"""

import json
import os
import sys
import time

import numpy as np

N_RING = 6  # distinct operand vectors rotated through the timed loop
# TABMAT_TPU_BENCH_SCALE shrinks row counts (used by the smoke test)
SCALE = float(os.environ.get("TABMAT_TPU_BENCH_SCALE", "1.0"))

_T0 = time.time()


def _note(msg):
    """Progress marker on stderr (the driver reads only the stdout JSON)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _timeit_ring(make_call, args_ring, n_rounds=4):
    """min wall-clock over len(ring)*n_rounds calls, blocking each call."""
    import jax

    for a in args_ring:  # warmup / compile every ring slot
        jax.block_until_ready(make_call(a))
    best = float("inf")
    for _ in range(n_rounds):
        for a in args_ring:
            t0 = time.perf_counter()
            jax.block_until_ready(make_call(a))
            best = min(best, time.perf_counter() - t0)
    return best


def _timeit_host(fn, n_iter=5):
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

    def ring(gen):
        out = []
        for _ in range(N_RING):
            arr = jnp.asarray(gen())
            arr.block_until_ready()
            out.append(arr)
        return out

    # ---------------- dense 1M x 50 fp64 ----------------
    n, k = max(int(1_000_000 * SCALE), 512), 50
    X_np = rng.standard_normal((n, k))
    dm = tm.DenseMatrix(X_np)

    d_ring = ring(lambda: rng.random(n))
    v_ring = ring(lambda: rng.standard_normal(k))
    vr_ring = ring(lambda: rng.standard_normal(n))
    d_np, v_np, vr_np = map(np.asarray, (d_ring[0], v_ring[0], vr_ring[0]))

    results["dense_sandwich"] = (
        _timeit_ring(lambda d: dm.sandwich(d), d_ring),
        _timeit_host(lambda: (X_np * d_np[:, None]).T @ X_np, 3),
    )
    _note("dense_sandwich done: %s" % (results["dense_sandwich"],))
    results["dense_matvec"] = (
        _timeit_ring(lambda v: dm.matvec(v), v_ring),
        _timeit_host(lambda: X_np @ v_np),
    )
    _note("dense_matvec done: %s" % (results["dense_matvec"],))
    results["dense_tmv"] = (
        _timeit_ring(lambda v: dm.transpose_matvec(v), vr_ring),
        _timeit_host(lambda: X_np.T @ vr_np),
    )
    _note("dense_tmv done: %s" % (results["dense_tmv"],))

    # accuracy spot-check on device (fp64 parity bar)
    S = np.asarray(dm.sandwich(d_ring[0]))
    S_ref = (X_np * d_np[:, None]).T @ X_np
    dense_relerr = float(np.abs(S - S_ref).max() / np.abs(S_ref).max())

    # ---------------- categorical 1M x 10k ----------------
    ncat = max(int(10_000 * SCALE), 16)
    codes = rng.integers(0, ncat, n).astype(np.int32)
    cm = tm.CategoricalMatrix(codes, categories=np.arange(ncat))
    cm.plan  # build segment plan outside the timed region
    C_csr = sps.csr_matrix((np.ones(n), codes, np.arange(n + 1)), shape=(n, ncat))
    C_csc = C_csr.tocsc()
    vc_ring = ring(lambda: rng.standard_normal(ncat))
    vc_np = np.asarray(vc_ring[0])

    results["cat_sandwich"] = (
        _timeit_ring(lambda d: cm.sandwich(d).diag, d_ring),
        _timeit_host(lambda: (C_csr.multiply(d_np[:, None]).T @ C_csr), 3),
    )
    _note("cat_sandwich done: %s" % (results["cat_sandwich"],))
    results["cat_matvec"] = (
        _timeit_ring(lambda v: cm.matvec(v), vc_ring),
        _timeit_host(lambda: C_csr @ vc_np),
    )
    _note("cat_matvec done: %s" % (results["cat_matvec"],))
    results["cat_tmv"] = (
        _timeit_ring(lambda v: cm.transpose_matvec(v), vr_ring),
        _timeit_host(lambda: C_csc.T @ vr_np),
    )
    _note("cat_tmv done: %s" % (results["cat_tmv"],))

    # ---------------- sparse 400k x 100 @ 1% ----------------
    ns, ks = max(int(400_000 * SCALE), 512), 100
    S_sp = sps.random(ns, ks, density=0.01, random_state=0, format="csc")
    S_csr = S_sp.tocsr()
    sm = tm.SparseMatrix(S_sp)
    sm._csr_parts(), sm._csc_parts(), sm._dense_mirror()
    ds_ring = ring(lambda: rng.random(ns))
    vs_ring = ring(lambda: rng.standard_normal(ks))
    vrs_ring = ring(lambda: rng.standard_normal(ns))
    ds_np, vs_np, vrs_np = map(np.asarray, (ds_ring[0], vs_ring[0], vrs_ring[0]))

    results["sparse_sandwich"] = (
        _timeit_ring(lambda d: sm.sandwich(d), ds_ring),
        _timeit_host(lambda: (S_sp.T @ S_sp.multiply(ds_np[:, None])).toarray(), 3),
    )
    _note("sparse_sandwich done: %s" % (results["sparse_sandwich"],))
    results["sparse_matvec"] = (
        _timeit_ring(lambda v: sm.matvec(v), vs_ring),
        _timeit_host(lambda: S_csr @ vs_np),
    )
    _note("sparse_matvec done: %s" % (results["sparse_matvec"],))
    results["sparse_tmv"] = (
        _timeit_ring(lambda v: sm.transpose_matvec(v), vrs_ring),
        _timeit_host(lambda: S_sp.T @ vrs_np),
    )
    _note("sparse_tmv done: %s" % (results["sparse_tmv"],))

    # ---------------- end-to-end GLM IRLS step (fused program) ----------------
    from tabmat_tpu.glm import irls_step

    X_dev = dm.unpack()
    y_np = X_np @ rng.standard_normal(k) + 0.1 * rng.standard_normal(n)
    y_dev = jnp.asarray(y_np)
    w_dev = jnp.ones(n, dtype=jnp.float64)
    beta_ring = ring(lambda: rng.standard_normal(k) * 0.01)

    X32_np = X_np.astype(np.float32)

    def glm_step_np(beta):
        # identical algorithm in numpy: f64 gradient, f32 inner CG
        # (mirrors irls_step's default inner_precision='float32')
        resid = y_np - X_np @ beta
        g = (X_np.T @ resid).astype(np.float32)
        x = np.zeros_like(g)
        r = g.copy()
        p = r.copy()
        rs = r @ r
        for _ in range(8):
            Ap = X32_np.T @ (X32_np @ p)
            alpha = rs / max(p @ Ap, np.float32(1e-30))
            x += alpha * p
            r -= alpha * Ap
            rs_new = r @ r
            p = r + (rs_new / max(rs, np.float32(1e-30))) * p
            rs = rs_new
        return beta + x.astype(np.float64)

    results["glm_irls_step"] = (
        _timeit_ring(
            lambda b: irls_step(X_dev, y_dev, w_dev, b, family="gaussian", n_cg=8),
            beta_ring,
        ),
        _timeit_host(lambda: glm_step_np(np.asarray(beta_ring[0])), 3),
    )

    _note("glm_irls_step done: %s" % (results["glm_irls_step"],))

    # ------- end-to-end GLM IRLS step on a mixed split design -------
    # (1M x (5 dense + 1k cat + 1k cat): the dense_cat benchmark shape as a
    # training step — the production access pattern, one XLA dispatch)
    import tabmat_tpu.parallel as tp
    from scipy import sparse as sps2

    kd, kc1, kc2 = 5, max(int(1000 * SCALE), 8), max(int(1000 * SCALE), 8)
    split = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((n, kd))),
            tm.CategoricalMatrix(
                rng.integers(0, kc1, n).astype(np.int32), categories=np.arange(kc1)
            ),
            tm.CategoricalMatrix(
                rng.integers(0, kc2, n).astype(np.int32), categories=np.arange(kc2)
            ),
        ]
    )
    from tabmat_tpu.parallel.design import DeviceDesign

    design = DeviceDesign.from_matrix(split)
    km = split.shape[1]
    y2 = jnp.asarray(rng.poisson(1.0, n).astype(np.float64))
    w2 = jnp.ones(n, dtype=jnp.float64)
    beta2_ring = ring(lambda: rng.standard_normal(km) * 0.001)

    # CPU equivalent: same algorithm over a scipy CSR of the same design
    X_csr64 = sps2.csr_matrix(
        sps2.hstack(
            [
                m.tocsr() if hasattr(m, "tocsr") else sps2.csr_matrix(m.toarray())
                for m in split.matrices
            ]
        ),
        dtype=np.float64,
    )
    y2_np = np.asarray(y2)

    def split_step_np(beta):
        # f64 throughout — the DeviceDesign path is exact f64 end to end
        eta = X_csr64 @ beta
        mu = np.exp(eta)
        resid = y2_np - mu
        g = X_csr64.T @ resid
        x = np.zeros_like(g)
        r = g.copy()
        p = r.copy()
        rs = r @ r
        for _ in range(8):
            Ap = X_csr64.T @ (mu * (X_csr64 @ p))
            alpha = rs / max(p @ Ap, 1e-300)
            x += alpha * p
            r -= alpha * Ap
            rs_new = r @ r
            p = r + (rs_new / max(rs, 1e-300)) * p
            rs = rs_new
        return beta + x

    results["glm_irls_step_mixed"] = (
        _timeit_ring(
            lambda b: irls_step(design, y2, w2, b, family="poisson", n_cg=8),
            beta2_ring,
        ),
        _timeit_host(lambda: split_step_np(np.asarray(beta2_ring[0])), 3),
    )

    _note("glm_irls_step_mixed done: %s" % (results["glm_irls_step_mixed"],))

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
                "cat 1Mx10k, sparse 400kx100; sandwich+matvec+tmv+irls_step)",
                "value": round(geo_ms, 4),
                "unit": "ms",
                "vs_baseline": round(speedup, 4),
                "detail": detail,
                "dense_sandwich_f64_relerr": dense_relerr,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
