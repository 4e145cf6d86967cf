"""Core contract tests: every op × every matrix type vs the densified oracle.

Mirrors the reference's test strategy (``tests/test_matrices.py``): a
parametrized matrix zoo, ``toarray()`` as the universal oracle, restriction
grids, ``out=`` accumulation semantics, error contracts, and the
standardize round-trip.
"""

import numpy as np
import pytest
from scipy import sparse as sps

import tabmat_tpu as tm


def base_array(order="C", dtype=np.float64) -> np.ndarray:
    x = np.array(
        [
            [0.0, -0.1],
            [1.0, 0.0],
            [0.0, 2.3],
            [-2.4, 0.0],
            [1.2, 0.5],
            [0.0, 0.0],
            [0.7, -1.1],
            [0.0, 0.4],
        ],
        dtype=dtype,
        order=order,
    )
    return x


def dense_C():
    return tm.DenseMatrix(base_array("C"))


def dense_F():
    return tm.DenseMatrix(base_array("F"))


def dense_1d():
    return tm.DenseMatrix(base_array()[:, 0])


def sparse_mat():
    return tm.SparseMatrix(sps.csc_matrix(base_array()))

def sparse_int64():
    m = sps.csc_matrix(base_array())
    m.indices = m.indices.astype(np.int64)
    m.indptr = m.indptr.astype(np.int64)
    return tm.SparseMatrix(m)


CODES = np.array([0, 2, 1, 0, 3, 1, 2, 0])
CATS = np.array(["a", "b", "c", "d"])


def cat_mat():
    return tm.CategoricalMatrix(CODES, categories=CATS)


def cat_drop_first():
    return tm.CategoricalMatrix(CODES, categories=CATS, drop_first=True)


def cat_missing_zero():
    codes = CODES.copy()
    codes[1] = -1
    return tm.CategoricalMatrix(
        codes, categories=CATS, cat_missing_method="zero"
    )


def cat_missing_convert():
    codes = CODES.copy().astype(float)
    codes[5] = np.nan
    return tm.CategoricalMatrix(
        codes, categories=CATS, cat_missing_method="convert"
    )


def cat_drop_missing_zero():
    codes = CODES.copy()
    codes[0] = -1
    return tm.CategoricalMatrix(
        codes, categories=CATS, drop_first=True, cat_missing_method="zero"
    )


def dense_readonly():
    arr = base_array("C")
    arr.setflags(write=False)
    return tm.DenseMatrix(arr)


def dense_from_jax():
    import jax.numpy as jnp

    return tm.DenseMatrix(jnp.asarray(base_array()))


def cat_from_values():
    return tm.CategoricalMatrix(CATS[CODES])  # factorized from raw values


def split_mat():
    return tm.SplitMatrix(
        [dense_C(), sparse_mat(), cat_mat()],
        [np.arange(2), np.arange(2, 4), np.arange(4, 8)],
    )


def split_cat_heavy():
    return tm.SplitMatrix(
        [cat_drop_first(), dense_F(), cat_missing_zero()],
        [np.arange(3), np.arange(3, 5), np.arange(5, 9)],
    )


def standardized_shift():
    shift = np.array([0.3, -0.1])
    return tm.StandardizedMatrix(dense_C(), shift)


def standardized_shift_scale():
    shift = np.array([0.3, -0.1])
    mult = np.array([0.7, 1.3])
    return tm.StandardizedMatrix(dense_F(), shift, mult)


def standardized_sparse():
    return tm.StandardizedMatrix(sparse_mat(), np.array([0.1, -2.0]))


def standardized_cat():
    return tm.StandardizedMatrix(
        cat_mat(), np.array([0.0, 0.1, -0.2, 0.3]), np.array([1.0, 2.0, 0.5, 1.5])
    )


def standardized_split():
    return tm.StandardizedMatrix(
        split_mat(), 0.1 * np.arange(8), 1 + 0.05 * np.arange(8)
    )


ZOO = [
    dense_C,
    dense_F,
    dense_1d,
    dense_readonly,
    dense_from_jax,
    cat_from_values,
    sparse_mat,
    sparse_int64,
    cat_mat,
    cat_drop_first,
    cat_missing_zero,
    cat_missing_convert,
    cat_drop_missing_zero,
    split_mat,
    split_cat_heavy,
    standardized_shift,
    standardized_shift_scale,
    standardized_sparse,
    standardized_cat,
    standardized_split,
]


def _result_to_np(res):
    if isinstance(res, tm.DiagonalResult):
        return res.toarray()
    if sps.issparse(res):
        return res.toarray()
    return np.asarray(res)


@pytest.fixture(params=ZOO, ids=[f.__name__ for f in ZOO])
def mat(request):
    return request.param()


RNG = np.random.default_rng(42)


def test_shape_and_dtype(mat):
    arr = mat.toarray()
    assert arr.shape == mat.shape
    assert np.dtype(mat.dtype) == np.float64


def test_matvec(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[1])
    np.testing.assert_allclose(np.asarray(mat.matvec(v)), arr @ v, atol=1e-12)


def test_matvec_cols(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[1])
    cols = np.unique([0, mat.shape[1] - 1]).astype(np.int32)
    expected = arr[:, cols] @ v[cols]
    np.testing.assert_allclose(
        np.asarray(mat.matvec(v, cols=cols)), expected, atol=1e-12
    )


def test_matvec_out(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[1])
    out = RNG.standard_normal(mat.shape[0])
    expected = out + arr @ v
    res = mat.matvec(v, out=out)
    assert res is out  # numpy out is mutated in place
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_matvec_wrong_shape_raises(mat):
    v = RNG.standard_normal(mat.shape[1] + 1)
    with pytest.raises(ValueError, match="not aligned"):
        mat.matvec(v)


def test_transpose_matvec(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[0])
    np.testing.assert_allclose(
        np.asarray(mat.transpose_matvec(v)), arr.T @ v, atol=1e-12
    )


@pytest.mark.parametrize("restrict", ["rows", "cols", "both", "none"])
def test_transpose_matvec_restricted(mat, restrict):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[0])
    rows = np.array([0, 2, 3, 6], dtype=np.int32) if restrict in ("rows", "both") else None
    cols = (
        np.unique([0, mat.shape[1] - 1]).astype(np.int32)
        if restrict in ("cols", "both")
        else None
    )
    r = rows if rows is not None else np.arange(mat.shape[0])
    c = cols if cols is not None else np.arange(mat.shape[1])
    expected = arr[np.ix_(r, c)].T @ v[r]
    np.testing.assert_allclose(
        np.asarray(mat.transpose_matvec(v, rows, cols)), expected, atol=1e-12
    )


def test_transpose_matvec_out(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[0])
    rows = np.array([0, 2, 3, 6], dtype=np.int32)
    cols = np.unique([0, mat.shape[1] - 1]).astype(np.int32)
    out = RNG.standard_normal(mat.shape[1])
    expected = out.copy()
    expected[cols] += arr[np.ix_(rows, cols)].T @ v[rows]
    res = mat.transpose_matvec(v, rows, cols, out=out)
    assert res is out
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_transpose_matvec_wrong_out_raises(mat):
    v = RNG.standard_normal(mat.shape[0])
    out = np.zeros(mat.shape[1] + 2)
    with pytest.raises(ValueError):
        mat.transpose_matvec(v, out=out)


@pytest.mark.parametrize("restrict", ["rows", "cols", "both", "none"])
def test_sandwich(mat, restrict):
    arr = mat.toarray()
    d = RNG.random(mat.shape[0])
    rows = np.array([0, 2, 3, 6], dtype=np.int32) if restrict in ("rows", "both") else None
    cols = (
        np.unique([0, mat.shape[1] - 1]).astype(np.int32)
        if restrict in ("cols", "both")
        else None
    )
    r = rows if rows is not None else np.arange(mat.shape[0])
    c = cols if cols is not None else np.arange(mat.shape[1])
    sub = arr[np.ix_(r, c)]
    expected = (sub * d[r][:, None]).T @ sub
    res = _result_to_np(mat.sandwich(d, rows, cols))
    np.testing.assert_allclose(res, expected, atol=1e-12)


def test_sandwich_bad_dtype_raises(mat):
    d = RNG.random(mat.shape[0]).astype(np.float32)
    with pytest.raises(TypeError):
        mat.sandwich(d)


def test_sandwich_bad_shape_raises(mat):
    d = RNG.random(mat.shape[0] + 1)
    with pytest.raises(ValueError):
        mat.sandwich(d)


def test_rmatmul(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[0])
    np.testing.assert_allclose(np.asarray(v @ mat), v @ arr, atol=1e-12)


def test_matmul_operator(mat):
    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[1])
    np.testing.assert_allclose(np.asarray(mat @ v), arr @ v, atol=1e-12)


def test_toarray_dtype(mat):
    assert mat.toarray().dtype == np.float64


def test_standardize_roundtrip(mat):
    if isinstance(mat, tm.StandardizedMatrix):
        pytest.skip("standardize is defined on MatrixBase")
    arr = mat.toarray()
    w = RNG.random(mat.shape[0])
    w /= w.sum()
    std, means, stds = mat.standardize(w, True, True)
    exp_means = arr.T @ w
    exp_stds = np.sqrt((w[:, None] * (arr - exp_means) ** 2).sum(0))
    np.testing.assert_allclose(means, exp_means, atol=1e-12)
    np.testing.assert_allclose(stds, exp_stds, atol=1e-12)
    mult = np.where(np.abs(exp_stds) < 1e-7, 1.0, 1 / np.where(exp_stds == 0, 1, exp_stds))
    expected_arr = (arr - exp_means) * mult
    np.testing.assert_allclose(std.toarray(), expected_arr, atol=1e-12)
    assert std.unstandardize() is mat


def test_standardize_no_center(mat):
    if isinstance(mat, tm.StandardizedMatrix):
        pytest.skip("standardize is defined on MatrixBase")
    w = RNG.random(mat.shape[0])
    w /= w.sum()
    std, means, stds = mat.standardize(w, False, False)
    np.testing.assert_allclose(means, 0)
    assert stds is None
    np.testing.assert_allclose(std.toarray(), mat.toarray(), atol=1e-12)


def test_getcol(mat):
    arr = mat.toarray()
    for i in [0, mat.shape[1] - 1]:
        col = mat.getcol(i)
        np.testing.assert_allclose(
            np.squeeze(col.toarray()), arr[:, i], atol=1e-12
        )


def test_astype_float32(mat):
    m32 = mat.astype(np.float32)
    assert np.dtype(m32.dtype) == np.float32


def test_jax_flavor_matvec(mat):
    """jax in → jax out, matching the numpy result."""
    import jax
    import jax.numpy as jnp

    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[1])
    res = mat.matvec(jnp.asarray(v))
    assert isinstance(res, jax.Array)
    np.testing.assert_allclose(np.asarray(res), arr @ v, atol=1e-12)


def test_jax_flavor_transpose_matvec(mat):
    import jax
    import jax.numpy as jnp

    arr = mat.toarray()
    v = RNG.standard_normal(mat.shape[0])
    res = mat.transpose_matvec(jnp.asarray(v))
    assert isinstance(res, jax.Array)
    np.testing.assert_allclose(np.asarray(res), arr.T @ v, atol=1e-12)


def test_jax_flavor_sandwich(mat):
    """jax d → device-resident sandwich result matching the oracle."""
    import jax.numpy as jnp

    arr = mat.toarray()
    d = RNG.random(mat.shape[0])
    res = mat.sandwich(jnp.asarray(d))
    np.testing.assert_allclose(
        _result_to_np(res), (arr * d[:, None]).T @ arr, atol=1e-12
    )


def test_standardize_scale_only(mat):
    if isinstance(mat, tm.StandardizedMatrix):
        pytest.skip("standardize is defined on MatrixBase")
    w = RNG.random(mat.shape[0])
    w /= w.sum()
    std, means, stds = mat.standardize(w, False, True)
    np.testing.assert_allclose(means, 0)
    assert stds is not None
    arr = mat.toarray()
    exp_means = arr.T @ w
    exp_stds = np.sqrt((w[:, None] * (arr - exp_means) ** 2).sum(0))
    mult = np.where(np.abs(exp_stds) < 1e-7, 1.0, 1 / np.where(exp_stds == 0, 1, exp_stds))
    np.testing.assert_allclose(std.toarray(), arr * mult, atol=1e-12)


def test_zero_sd_cols_standardize():
    """Zero-variance columns keep mult == 1 (reference
    test_standardized_mat.py:42-46): standardize never divides by ~0."""
    n_rows = 100
    weights = np.ones(n_rows) / n_rows
    X, means, stds = tm.DenseMatrix(np.ones([n_rows, 1])).standardize(
        weights, True, True
    )
    np.testing.assert_allclose(np.asarray(X.mult), [1.0])
    assert np.all(np.isfinite(np.asarray(X.toarray())))
