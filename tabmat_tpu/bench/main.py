"""Benchmark CLI: ops × matrix zoo, with numpy/scipy baselines.

Same shape as the reference CLI (``benchmark/main.py:58-383``): choose
matrices and operations, optionally track peak host memory, write CSV.

Device timing uses the **chained-marginal protocol** (see ``bench.py`` and
``docs/tpu_platform_notes.md``): each op runs as a self-feeding chain
closed by one scalar fetch, and the per-op cost is the difference of two
chain lengths — this cancels the relay's ~30 ms synchronous-observation
floor and defeats its request memoization, measuring steady-state device
throughput (the production access pattern).  Host baselines use plain
min-of-averages (nothing to cancel there).

Example::

    python -m tabmat_tpu.bench.main --matrix_name dense,sparse --scale 0.01
"""

import json
import time

import click
import numpy as np

from .generate import get_all_benchmark_matrices
from .memory import hbm_bytes_in_use, track_peak_mem

OPS = ("matvec", "transpose-matvec", "sandwich")
K1, K2 = 3, 13  # chain lengths for the device marginal differencing


def _block(res):
    if isinstance(res, (list, tuple)):
        for r in res:
            _block(r)
    elif hasattr(res, "block_until_ready"):
        res.block_until_ready()
    elif hasattr(res, "diag"):
        _block(res.diag)
    return res


def _sandwich_probe(S):
    """A scalar of a sandwich result (dense (k,k) or DiagonalResult)."""
    import jax.numpy as jnp

    if hasattr(S, "diag"):
        return S.diag[0]
    return jnp.ravel(S)[0]


def _get_chain_step(mat, op):
    """Self-feeding device chain step and its initial state for ``op``."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, k = mat.shape
    # The inter-link fold rescales the fixed input by a scalar probe of
    # the output (same pattern as the sandwich fold below): each link's
    # input buffer differs (tanh(sum) varies with the propagated scale,
    # and ops are linear so the scale never repeats), which defeats
    # relay memoization / XLA CSE, while the fold itself costs one
    # reduction + one elementwise write — it no longer bills an
    # n-length ``jnp.tile`` relayout (2.8 ms at 3M rows) to the op.
    if op == "matvec":
        x0 = jnp.asarray(rng.standard_normal(k))
        fold = jax.jit(lambda o: x0 * (1.0 + 1e-9 * jnp.tanh(jnp.sum(o))))
        return (lambda x: fold(mat.matvec(x))), x0
    if op == "transpose-matvec":
        x0 = jnp.asarray(rng.standard_normal(n))
        fold = jax.jit(lambda o: x0 * (1.0 + 1e-9 * jnp.tanh(jnp.sum(o))))
        return (lambda x: fold(mat.transpose_matvec(x))), x0
    if op == "sandwich":
        d0 = jnp.asarray(rng.random(n))
        return (lambda x: d0 * (1.0 + 1e-9 * _sandwich_probe(mat.sandwich(x)))), d0
    raise ValueError(op)


def _marginal_device(step, x0):
    """Chained-marginal per-op time with an adaptive chain length.

    The chain length doubles until the K2−K1 difference clears the
    relay's observation jitter by a wide margin (25 ms), so a cell can
    never be an artifact of the noise floor: every reported marginal is
    backed by a measured difference ≥ 25 ms of real device work.  Each
    link feeds the next (distinct inputs per link) and each run is
    seeded differently, so neither XLA CSE nor relay memoization can
    collapse the chain.
    """
    import jax.numpy as jnp

    def run(K, seed):
        x = x0 * (1.0 + jnp.asarray(float(seed), dtype=x0.dtype) * 1e-9)
        t0 = time.perf_counter()
        for _ in range(K):
            x = step(x)
        np.asarray(jnp.ravel(x)[0])
        return time.perf_counter() - t0

    run(2, 17)  # compile / warm
    seed = 100
    for K2 in (K1 + 10, K1 + 40, K1 + 160, K1 + 640):
        best = float("inf")
        for _ in range(2):
            seed += 1
            t1 = run(K1, seed)
            seed += 1
            t2 = run(K2, seed)
            best = min(best, (t2 - t1) / (K2 - K1))
        if best * (K2 - K1) >= 0.025:
            return best
    # even 640 marginal links took < 25 ms → per-op < 39 µs; report the
    # longest-chain marginal (floored at 0: differences can go negative
    # only through jitter, and at this K2 jitter per link is < 40 ns)
    return max(best, 1e-6)


def _get_baseline_fn(mat, op):
    """numpy/scipy equivalent on the host (the reference's competitors)."""
    from scipy import sparse as sps

    arr = None
    try:
        arr = mat.unpack()
    except Exception:
        pass
    if not isinstance(arr, np.ndarray) and not sps.issparse(arr):
        if hasattr(mat, "tocsr"):
            # categorical: scipy one-hot CSR (never densify 1M×100k)
            arr = mat.tocsr()
        elif hasattr(mat, "matrices"):
            # split designs: hstack per-block CSRs
            arr = sps.hstack(
                [
                    m.tocsr()
                    if hasattr(m, "tocsr")
                    else sps.csr_matrix(np.asarray(m.toarray()))
                    for m in mat.matrices
                ],
                format="csr",
            )
        else:
            arr = sps.csr_matrix(mat.toarray())
    if isinstance(arr, (np.ndarray,)) and hasattr(arr, "device"):
        arr = np.asarray(arr)

    rng = np.random.default_rng(0)
    if op == "matvec":
        v = rng.standard_normal(mat.shape[1])
        return lambda: arr @ v
    if op == "transpose-matvec":
        v = rng.standard_normal(mat.shape[0])
        return lambda: arr.T @ v
    if op == "sandwich":
        d = rng.random(mat.shape[0])
        if sps.issparse(arr):
            return lambda: (arr.T @ arr.multiply(d[:, None]))
        return lambda: (arr * d[:, None]).T @ arr
    raise ValueError(op)


def run_one_benchmark_set(mat, name, ops, n_iterations, include_baseline, bench_memory):
    rows = []
    for op in ops:
        step, x0 = _get_chain_step(mat, op)
        hbm_before = hbm_bytes_in_use()
        best = _marginal_device(step, x0)
        hbm_after = hbm_bytes_in_use()
        row = {"matrix": name, "operation": op, "library": "tabmat_tpu", "time_s": best}
        if hbm_before is not None and hbm_after is not None:
            # HBM accounting (the real resource for device-resident ops;
            # host tracemalloc sees ~5 KB): persistent structural caches
            # this op built — v4 plane stacks, ozaki slices, sparse
            # mirrors, window plans — as the delta of live device bytes.
            row["hbm_cache_bytes"] = hbm_after - hbm_before
            row["hbm_total_bytes"] = hbm_after
        if bench_memory:
            sync_fn = lambda: _block(step(x0))  # noqa: E731
            row["peak_mem_bytes"] = track_peak_mem(sync_fn)
        rows.append(row)

        if include_baseline:
            bfn = _get_baseline_fn(mat, op)
            bfn()  # warm
            bbest = float("inf")
            for _ in range(max(n_iterations // 10, 3)):
                t0 = time.perf_counter()
                bfn()
                bbest = min(bbest, time.perf_counter() - t0)
            rows.append(
                {
                    "matrix": name,
                    "operation": op,
                    "library": "numpy/scipy",
                    "time_s": bbest,
                }
            )
    return rows


@click.command()
@click.option("--matrix_name", default=None, help="comma-separated design names")
@click.option("--ops", default=None, help="comma-separated op subset (default: all)")
@click.option("--n_iterations", default=20, type=int)
@click.option("--include_baseline", is_flag=True)
@click.option("--bench_memory", is_flag=True)
@click.option("--standardized", is_flag=True)
@click.option("--scale", default=1.0, type=float, help="row-count scale factor")
@click.option("--output", default=None, help="CSV output path")
@click.option(
    "--profile_dir",
    default=None,
    help="capture a jax.profiler trace of the benchmark into this directory",
)
def run_all_benchmarks(
    matrix_name, ops, n_iterations, include_baseline, bench_memory, standardized,
    scale, output, profile_dir
):
    """Run the benchmark suite and print/save results."""
    ops = tuple(ops.split(",")) if ops else OPS
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    designs = get_all_benchmark_matrices(scale=scale)
    if matrix_name:
        wanted = matrix_name.split(",")
        designs = {k: v for k, v in designs.items() if k in wanted}

    all_rows = []
    for name, thunk in designs.items():
        mat = thunk()
        if standardized:
            import tabmat_tpu as tm

            mat = tm.StandardizedMatrix(mat, np.zeros(mat.shape[1]))
        rows = run_one_benchmark_set(
            mat, name, ops, n_iterations, include_baseline, bench_memory
        )
        all_rows.extend(rows)
        for r in rows:
            click.echo(json.dumps(r))

    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        click.echo(f"profiler trace in {profile_dir}")

    if output:
        import csv

        keys = sorted({k for r in all_rows for k in r})
        with open(output, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            writer.writerows(all_rows)
        click.echo(f"wrote {output}")


if __name__ == "__main__":
    run_all_benchmarks()
