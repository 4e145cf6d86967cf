"""Fused sparse transpose-matvec kernel (ops/pallas_tmv_fused).

Interpret mode on CPU; the same kernel is hardware-validated by the
SparseMatrix routing tests when a TPU is present.  Reference semantics:
``tabmat/ext/sparse.pyx:142-199`` (CSC walk of X.T @ v).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.sparse as sps

from tabmat_tpu.ops import pallas_tmv_fused as ptf


def _run_fused(X_csr, v, interpret=True):
    n, k = X_csr.shape
    row_ids = np.repeat(np.arange(n), np.diff(X_csr.indptr))
    plan = ptf.build_plan(row_ids, X_csr.indices, n, k)
    if plan is None:
        return None
    dh, dl = ptf.split_planes(jnp.asarray(X_csr.data))
    R = plan.codes2d.shape[0]
    pad = R * 128 - X_csr.nnz
    dh2d = jnp.pad(dh, (0, pad)).reshape(R, 128)
    dl2d = jnp.pad(dl, (0, pad)).reshape(R, 128)
    S = ptf.S_F64 if v.dtype == np.float64 else ptf.S_F32
    out = ptf.fused_tmv(
        jnp.asarray(v), dh2d, dl2d,
        jnp.asarray(plan.codes2d), jnp.asarray(plan.ccodes2d),
        jnp.asarray(plan.wsb), jnp.asarray(plan.r0),
        plan.W, plan.BR, plan.SB, plan.kpad, S, plan.nblk, k,
        v.dtype == np.float64, interpret,
    )
    return np.asarray(out)


def _check(X_csr, v, tol=5e-14):
    out = _run_fused(X_csr, v)
    assert out is not None
    ref = X_csr.T @ v
    scale = np.abs(X_csr.T) @ np.abs(v) + 1e-300
    np.testing.assert_array_less(np.abs(out - ref) / scale, tol)


@pytest.mark.parametrize(
    "n,k,density",
    [
        (20_000, 100, 0.01),  # driver-bench sparse shape (scaled down)
        (30_000, 3, 0.01),    # sparse_narrow shape
        (999, 130, 0.05),     # non-multiple-of-128 k and n
        (5_000, 512, 0.01),   # widest supported k
        (400, 1, 0.5),        # single column
    ],
)
def test_fused_tmv_matches_scipy(n, k, density):
    rng = np.random.default_rng(42)
    X = sps.random(n, k, density=density, random_state=rng, format="csr",
                   dtype=np.float64)
    X.data = rng.standard_normal(X.nnz)
    v = rng.standard_normal(n)
    _check(X, v)


def test_fused_tmv_empty_columns_and_rows():
    # columns with no nnz must come back exactly zero
    rng = np.random.default_rng(3)
    X = sps.random(5_000, 50, density=0.01, random_state=rng, format="csr",
                   dtype=np.float64)
    X = sps.hstack([X[:, :20], sps.csr_matrix((5_000, 5)), X[:, 20:]]).tocsr()
    v = rng.standard_normal(5_000)
    out = _run_fused(X, v)
    ref = X.T @ v
    assert np.all(out[20:25] == 0.0)
    scale = np.abs(X.T) @ np.abs(v) + 1e-300
    np.testing.assert_array_less(np.abs(out - ref) / scale, 5e-14)


def test_fused_tmv_f32():
    rng = np.random.default_rng(7)
    X = sps.random(8_000, 60, density=0.02, random_state=rng, format="csr",
                   dtype=np.float32)
    X.data = rng.standard_normal(X.nnz).astype(np.float32)
    v = rng.standard_normal(8_000).astype(np.float32)
    out = _run_fused(X, v)
    ref = (X.T.astype(np.float64) @ v.astype(np.float64))
    scale = np.abs(X.T) @ np.abs(v) + 1e-30
    np.testing.assert_array_less(np.abs(out - ref) / scale, 1e-6)


def test_fused_tmv_wide_dynamic_range():
    # per-tile scaling keeps the error at the old global-scale route's
    # level even when the data spans ~2^46 of magnitude
    rng = np.random.default_rng(11)
    X = sps.random(20_000, 100, density=0.01, random_state=rng, format="csr",
                   dtype=np.float64)
    X.data = rng.standard_normal(X.nnz) * np.exp(rng.standard_normal(X.nnz) * 4)
    v = rng.standard_normal(20_000)
    out = _run_fused(X, v)
    ref = X.T @ v
    scale = np.abs(X.T) @ np.abs(v) + 1e-300
    np.testing.assert_array_less(np.abs(out - ref) / scale, 1e-9)


def test_build_plan_rejections():
    # unsorted row ids
    assert ptf.build_plan(np.array([3, 1, 2]), np.array([0, 0, 0]), 10, 2) is None
    # too-wide k
    assert ptf.build_plan(np.arange(100), np.zeros(100, int), 200, 2048) is None
    # empty
    assert ptf.build_plan(np.array([], dtype=int), np.array([], dtype=int), 10, 2) is None


def test_plan_layouts_are_structural():
    rng = np.random.default_rng(5)
    X = sps.random(10_000, 20, density=0.01, random_state=rng, format="csr")
    row_ids = np.repeat(np.arange(10_000), np.diff(X.indptr))
    plan = ptf.build_plan(row_ids, X.indices, 10_000, 20)
    assert plan.codes2d.shape[0] % plan.BR == 0
    assert plan.codes2d.shape == plan.ccodes2d.shape
    # window blocks stay in range: wsb+1 must be a valid table block
    assert int(plan.wsb.max()) + 1 < plan.nblk
    assert np.all(plan.r0 >= 0) and np.all(plan.r0 < plan.W)
    assert plan.BR % plan.SB == 0
