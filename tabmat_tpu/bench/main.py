"""Benchmark CLI: ops × matrix zoo, with numpy/scipy baselines.

Same shape as the reference CLI (``benchmark/main.py:58-383``): choose
matrices and operations, time min-over-iterations, optionally track peak
host memory, write CSV.

Example::

    python -m tabmat_tpu.bench.main --matrix_name dense,sparse --scale 0.01
"""

import json
import time

import click
import numpy as np

from .generate import get_all_benchmark_matrices
from .memory import track_peak_mem

OPS = ("matvec", "transpose-matvec", "sandwich")


def _block(res):
    import jax

    if isinstance(res, (list, tuple)):
        for r in res:
            _block(r)
    elif hasattr(res, "block_until_ready"):
        res.block_until_ready()
    elif hasattr(res, "diag"):
        _block(res.diag)
    return res


def _get_op_fn(mat, op, use_device_vectors=True):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if op == "matvec":
        v = rng.standard_normal(mat.shape[1])
        v = jnp.asarray(v) if use_device_vectors else v
        return lambda: _block(mat.matvec(v))
    if op == "transpose-matvec":
        v = rng.standard_normal(mat.shape[0])
        v = jnp.asarray(v) if use_device_vectors else v
        return lambda: _block(mat.transpose_matvec(v))
    if op == "sandwich":
        d = rng.random(mat.shape[0])
        d = jnp.asarray(d) if use_device_vectors else d
        return lambda: _block(mat.sandwich(d))
    raise ValueError(op)


def _get_baseline_fn(mat, op):
    """numpy/scipy equivalent on the host (the reference's competitors)."""
    from scipy import sparse as sps

    arr = None
    try:
        arr = mat.unpack()
    except Exception:
        pass
    if not isinstance(arr, np.ndarray) and not sps.issparse(arr):
        # mixed/categorical designs: scipy CSR of the full matrix
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
        fn = _get_op_fn(mat, op)
        fn()  # warmup / compile
        best = float("inf")
        for _ in range(n_iterations):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        row = {"matrix": name, "operation": op, "library": "tabmat_tpu", "time_s": best}
        if bench_memory:
            row["peak_mem_bytes"] = track_peak_mem(fn)
        rows.append(row)

        if include_baseline:
            bfn = _get_baseline_fn(mat, op)
            bfn()
            bbest = float("inf")
            for _ in range(max(n_iterations // 10, 2)):
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
    matrix_name, n_iterations, include_baseline, bench_memory, standardized, scale,
    output, profile_dir
):
    """Run the benchmark suite and print/save results."""
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
            mat, name, OPS, n_iterations, include_baseline, bench_memory
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
