"""Hardware-gated Pallas/MXU kernel tests (skipped on CPU CI).

Run on the real chip with::

    TABMAT_TPU_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -v

CPU CI skips these (the kernels are TPU-only); the same numerics are
exercised continuously on hardware by ``bench.py`` and the diagnostics.
"""

import numpy as np
import pytest

import tabmat_tpu as tm
from tabmat_tpu._config import on_tpu

pytestmark = pytest.mark.skipif(not on_tpu(), reason="needs the TPU platform")

import jax.numpy as jnp  # noqa: E402


def test_pallas_table_gather_f64_exact():
    from tabmat_tpu.ops import pallas_gather as pg

    rng = np.random.default_rng(0)
    n, W = 200_000, 3000
    codes = rng.integers(-1, W, n).astype(np.int32)
    c2d = jnp.asarray(pg.build_codes2d(codes))
    v = jnp.asarray(rng.standard_normal(W))
    got = np.asarray(pg.table_gather(v, c2d, n))
    ref = np.where(codes >= 0, np.asarray(v)[np.clip(codes, 0, None)], 0.0)
    np.testing.assert_array_equal(got, ref)  # bit-exact vs device values


def test_mxu_segsum_exact():
    from tabmat_tpu.ops import pallas_segsum as ps

    rng = np.random.default_rng(1)
    n, W = 300_000, 2000
    codes = rng.integers(-1, W, n).astype(np.int32)
    cc = jnp.asarray(ps.build_codes_col(codes))
    v = rng.standard_normal(n) * np.exp(rng.uniform(-6, 6, n))
    got = np.asarray(ps.segsum(jnp.asarray(v), cc, W))
    ref = np.zeros(W)
    np.add.at(ref, codes[codes >= 0], v[codes >= 0])
    assert np.abs(got - ref).max() / np.abs(v).sum() < 1e-15


def test_wide_sandwich_matches_scipy():
    from scipy import sparse as sps

    from tabmat_tpu.ops import sparse_wide

    rng = np.random.default_rng(2)
    A = sps.random(3000, 600, density=0.02, random_state=3, format="csc")
    plan = sparse_wide.WideSandwichPlan(A)
    d = rng.random(3000)  # GLM-style non-negative weights
    S = np.asarray(sparse_wide.wide_sandwich(plan, jnp.asarray(d)))
    Sref = (A.T @ sps.diags(d) @ A).toarray()
    assert np.abs(S - Sref).max() / np.abs(Sref).max() < 1e-12


def test_cat_matvec_class_layer_on_tpu():
    rng = np.random.default_rng(3)
    n, W = 100_000, 5000
    codes = rng.integers(0, W, n).astype(np.int32)
    cm = tm.CategoricalMatrix(codes, categories=np.arange(W), drop_first=True)
    v = rng.standard_normal(W - 1)
    got = np.asarray(cm.matvec(v))
    eff = codes - 1
    ref = np.where(eff >= 0, v[np.clip(eff, 0, None)], 0.0)
    assert np.abs(got - ref).max() < 1e-13


def test_windowed_take_monotone_f64():
    from tabmat_tpu.ops import pallas_window_take as wt

    rng = np.random.default_rng(11)
    idx = np.sort(rng.integers(0, 50_000, size=200_000))
    plan = wt.build_plan(idx)
    assert plan is not None
    src = rng.standard_normal(50_000)
    got = np.asarray(
        wt.monotone_take(jnp.asarray(src), plan, jnp.asarray(plan.codes2d))
    )
    # platform f64 == (hi, lo) f32 pair: exact round-trip on device
    np.testing.assert_array_equal(got, src[idx])


def test_sparse_windowed_matvec_tmv_routes():
    import scipy.sparse as sps

    rng = np.random.default_rng(12)
    S = sps.random(40_000, 100, density=0.01, format="csc", random_state=5)
    X = tm.SparseMatrix(S)
    assert X._window_matvec_parts(np.float64) is not None
    assert X._window_tmv_parts(np.float64) is not None
    v = rng.standard_normal(100)
    w = rng.standard_normal(40_000)
    np.testing.assert_allclose(np.asarray(X.matvec(v)), S @ v, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(X.transpose_matvec(w)), S.T @ w, rtol=1e-12
    )
