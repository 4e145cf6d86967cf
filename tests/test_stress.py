"""Stress tests (marked slow / high_memory; mirrors reference strategy)."""

import numpy as np
import pytest

import tabmat_tpu as tm


@pytest.mark.slow
def test_one_cat_benchmark_scale():
    """1M rows x 100k categories — the reference's one_cat design."""
    rng = np.random.default_rng(0)
    n, K = 1_000_000, 100_000
    codes = rng.integers(0, K, n).astype(np.int32)
    cm = tm.CategoricalMatrix(codes, categories=np.arange(K))
    d = rng.random(n)
    diag = np.asarray(cm.sandwich(d).diag)
    ref = np.bincount(codes, weights=d, minlength=K)
    np.testing.assert_allclose(diag, ref, rtol=1e-8)  # cumsum order vs bincount

    v = rng.standard_normal(K)
    out = np.asarray(cm.matvec(v))
    np.testing.assert_allclose(out[:100], v[codes[:100]], atol=1e-12)


@pytest.mark.slow
def test_narrow_sparse_benchmark_scale():
    """3M x 3 sparse — the reference's sparse_narrow design."""
    from scipy import sparse as sps

    A = sps.random(3_000_000, 3, density=0.01, random_state=0, format="csc")
    sm = tm.SparseMatrix(A)
    d = np.random.default_rng(1).random(3_000_000)
    S = sm.sandwich(d)
    ref = (A.T @ A.multiply(d[:, None])).toarray()
    np.testing.assert_allclose(S, ref, atol=1e-9)


@pytest.mark.high_memory
def test_dense_1m_x_50():
    """The BASELINE.json headline config end-to-end on this backend."""
    rng = np.random.default_rng(2)
    n, k = 1_000_000, 50
    X = rng.standard_normal((n, k))
    dm = tm.DenseMatrix(X)
    d = rng.random(n)
    S = dm.sandwich(d)
    ref = (X * d[:, None]).T @ X
    relerr = np.abs(np.asarray(S) - ref).max() / np.abs(ref).max()
    assert relerr < 1e-12, relerr
