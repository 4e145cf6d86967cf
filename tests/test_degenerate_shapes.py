"""Degenerate-shape contract: every op works at the shape corners.

Mirrors the reference's empty-matrix/edge coverage
(``tests/test_categorical_matrix.py:246-248`` and the zoo's implicit
1-column cases): zero-nnz sparse, zero-column categorical (drop_first of
a single level), 1×k and n×1 dense, single-block splits, and 1-row
frames all run sandwich/matvec/transpose-matvec against the dense
oracle.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sps

import tabmat_tpu as tm


def _oracle_check(mat):
    rng = np.random.default_rng(0)
    n, k = mat.shape
    A = mat.toarray()
    d = rng.random(n)
    v = rng.random(k)
    r = rng.random(n)
    S = mat.sandwich(d)
    S = np.asarray(S.toarray() if hasattr(S, "toarray") else S)
    np.testing.assert_allclose(S, (A * d[:, None]).T @ A, atol=1e-10)
    np.testing.assert_allclose(np.asarray(mat.matvec(v)), A @ v, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(mat.transpose_matvec(r)), A.T @ r, atol=1e-10
    )


CASES = {
    "sparse_zero_nnz": lambda: tm.SparseMatrix(sps.csc_matrix((50, 4))),
    "sparse_1x1": lambda: tm.SparseMatrix(sps.csc_matrix(np.array([[2.0]]))),
    "cat_single_level": lambda: tm.CategoricalMatrix(
        pd.Categorical(["a"] * 30)
    ),
    "cat_zero_cols": lambda: tm.CategoricalMatrix(
        pd.Categorical(["a"] * 10), drop_first=True
    ),
    "dense_one_col": lambda: tm.DenseMatrix(
        np.random.default_rng(1).random((25, 1))
    ),
    "dense_one_row": lambda: tm.DenseMatrix(
        np.random.default_rng(2).random((1, 5))
    ),
    "split_single_block": lambda: tm.SplitMatrix(
        [tm.DenseMatrix(np.random.default_rng(3).random((20, 3)))],
        [np.arange(3)],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_ops_at_degenerate_shapes(name):
    _oracle_check(CASES[name]())


def test_standardized_tiny():
    mat = tm.DenseMatrix(np.random.default_rng(4).random((30, 2)))
    std, _, _ = mat.standardize(np.full(30, 1 / 30), True, True)
    _oracle_check(std)


def test_from_df_single_row():
    df = pd.DataFrame({"x": [1.0], "c": pd.Categorical(["a"])})
    X = tm.from_df(df)
    assert X.shape == (1, 2)
    _oracle_check(X)
