"""Smoke-test the benchmark CLI at tiny scale (mirrors reference strategy)."""

import numpy as np
from click.testing import CliRunner

from tabmat_tpu.bench.generate import get_all_benchmark_matrices
from tabmat_tpu.bench.main import run_all_benchmarks


def test_generators_tiny():
    designs = get_all_benchmark_matrices(scale=0.0001)
    for name in ("dense", "sparse", "two_cat"):
        mat = designs[name]()
        assert mat.shape[0] >= 16
        d = np.random.default_rng(0).random(mat.shape[0])
        mat.sandwich(d)


def test_cli_smoke():
    runner = CliRunner()
    result = runner.invoke(
        run_all_benchmarks,
        [
            "--matrix_name", "dense,sparse",
            "--scale", "0.0001",
            "--n_iterations", "2",
            "--include_baseline",
        ],
    )
    assert result.exit_code == 0, result.output
    assert "tabmat_tpu" in result.output
    assert "numpy/scipy" in result.output
