"""Smoke-test the driver benchmark script at tiny scale (CPU).

Guards against bench.py breaking silently between rounds (the driver runs
it unattended on hardware).
"""

import json
import os
import subprocess
import sys


def test_bench_py_smoke():
    env = dict(os.environ)
    env["TABMAT_TPU_BENCH_SCALE"] = "0.002"
    env["PYTHONPATH"] = "/root/repo"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import bench; bench.N_RING = 2; bench.main()"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(d)
    assert d["value"] > 0
    assert d["dense_sandwich_f64_relerr"] < 1e-11
