"""Native host-helper tests (counting argsort, is_sorted, combine_codes)."""

import numpy as np
import pytest

from tabmat_tpu import _native


def test_counting_argsort_matches_numpy():
    rng = np.random.default_rng(0)
    keys = rng.integers(-1, 50, 10_000).astype(np.int32)
    perm, bounds = _native.counting_argsort(keys, 50)
    ref_perm = np.argsort(keys, kind="stable")
    ref_bounds = np.searchsorted(keys[ref_perm], np.arange(51))
    np.testing.assert_array_equal(perm, ref_perm)
    np.testing.assert_array_equal(bounds, ref_bounds)


def test_counting_argsort_empty():
    perm, bounds = _native.counting_argsort(np.array([], dtype=np.int32), 5)
    assert len(perm) == 0
    np.testing.assert_array_equal(bounds, np.zeros(6, dtype=np.int32))


def test_is_sorted():
    assert _native.is_sorted(np.array([1, 2, 2, 3]))
    assert not _native.is_sorted(np.array([1, 0]))
    assert _native.is_sorted(np.array([], dtype=np.int64))


def test_combine_codes():
    a = np.array([0, 1, -1, 2], dtype=np.int32)
    b = np.array([1, -1, 0, 2], dtype=np.int32)
    out = _native.combine_codes(a, b, 3)
    np.testing.assert_array_equal(out, [1, -1, -1, 8])


def test_sparse_walks_match_scipy():
    """OpenMP CSR matvec / CSC tmv match scipy exactly on f64."""
    import scipy.sparse as sps

    from tabmat_tpu import _native

    rng = np.random.default_rng(3)
    A = sps.random(5000, 37, density=0.03, format="csc", random_state=7)
    csr = A.tocsr()
    v = rng.standard_normal(37)
    r = rng.standard_normal(5000)
    got_mv = _native.csr_matvec(
        csr.data, csr.indices, csr.indptr, 5000, v
    )
    got_tmv = _native.csc_tmv(A.data, A.indices, A.indptr, 37, r)
    if got_mv is None:  # no native lib on this host: fallback contract
        assert got_tmv is None
        return
    np.testing.assert_allclose(got_mv, csr @ v, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(got_tmv, A.T @ r, rtol=1e-13, atol=1e-13)
    # out= accumulates in place
    out = np.ones(37)
    res = _native.csc_tmv(A.data, A.indices, A.indptr, 37, r, out=out)
    assert res is out
    np.testing.assert_allclose(out, 1.0 + A.T @ r, rtol=1e-13)


def test_sparse_host_walk_class_route():
    """Numpy callers ride the host walk incl. rows/cols/out contracts."""
    import scipy.sparse as sps

    import tabmat_tpu as tm

    rng = np.random.default_rng(4)
    A = sps.random(3000, 21, density=0.05, format="csc", random_state=9)
    m = tm.SparseMatrix(A)
    D = A.toarray()
    v = rng.standard_normal(21)
    r = rng.standard_normal(3000)
    np.testing.assert_allclose(m.matvec(v), D @ v, rtol=1e-12)
    np.testing.assert_allclose(m.transpose_matvec(r), D.T @ r, rtol=1e-12)
    rows = np.arange(0, 3000, 3)
    cols = np.array([2, 5, 19])
    np.testing.assert_allclose(
        m.transpose_matvec(r, rows=rows, cols=cols),
        D[rows][:, cols].T @ r[rows],
        rtol=1e-12,
    )
    out = np.full(21, 2.0)
    m.transpose_matvec(r, out=out)
    np.testing.assert_allclose(out, 2.0 + D.T @ r, rtol=1e-12)
    out2 = np.full(3000, -1.0)
    m.matvec(v, cols=cols, out=out2)
    vm = np.zeros(21)
    vm[cols] = v[cols]
    np.testing.assert_allclose(out2, -1.0 + D @ vm, rtol=1e-12)
