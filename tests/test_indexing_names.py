"""Indexing and names-API edge cases (reference parity sweep)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sps

import tabmat_tpu as tm


@pytest.fixture
def dense():
    return tm.DenseMatrix(
        np.arange(12.0).reshape(4, 3), column_names=["a", "b", "c"]
    )


def test_dense_row_slice(dense):
    sub = dense[1:3]
    assert isinstance(sub, tm.DenseMatrix)
    np.testing.assert_allclose(sub.toarray(), dense.toarray()[1:3])
    assert sub.column_names == ["a", "b", "c"]


def test_dense_col_array(dense):
    sub = dense[:, [2, 0]]
    np.testing.assert_allclose(sub.toarray(), dense.toarray()[:, [2, 0]])
    assert sub.column_names == ["c", "a"]


def test_dense_row_array_col_array(dense):
    sub = dense[[0, 3], [1, 2]]
    np.testing.assert_allclose(
        sub.toarray(), dense.toarray()[np.ix_([0, 3], [1, 2])]
    )


def test_dense_single_row_list(dense):
    sub = dense[[2], :]
    assert sub.shape == (1, 3)


def test_sparse_indexing():
    m = tm.SparseMatrix(
        sps.csc_matrix(np.arange(12.0).reshape(4, 3)), column_names=["a", "b", "c"]
    )
    sub = m[:, [1]]
    assert isinstance(sub, tm.SparseMatrix)
    assert sub.column_names == ["b"]
    np.testing.assert_allclose(sub.toarray(), m.toarray()[:, [1]])


def test_split_row_indexing_only():
    split = tm.SplitMatrix(
        [
            tm.DenseMatrix(np.ones((4, 2))),
            tm.CategoricalMatrix(["x", "y", "x", "y"]),
        ]
    )
    sub = split[np.array([0, 2])]
    assert isinstance(sub, tm.SplitMatrix)
    assert sub.shape == (2, 4)
    with pytest.raises(NotImplementedError):
        split[:, [1]]
    # single int row
    sub1 = split[1]
    assert sub1.shape == (1, 4)


def test_getcol_wraparound():
    dense = tm.DenseMatrix(np.arange(8.0).reshape(4, 2))
    np.testing.assert_allclose(
        np.squeeze(dense.getcol(-1).toarray()),
        np.squeeze(dense.getcol(1).toarray()),
    )
    cat = tm.CategoricalMatrix(["a", "b", "a"])
    np.testing.assert_allclose(
        np.squeeze(cat.getcol(-1 % 2).toarray()), cat.toarray()[:, 1]
    )


def test_get_names_missing_prefix():
    dense = tm.DenseMatrix(np.ones((2, 3)), column_names=["a", None, "c"])
    names = dense.get_names(missing_prefix="col_")
    assert names == ["a", "col_1", "c"]


def test_cat_names_missing_prefix():
    cat = tm.CategoricalMatrix(["x", "y"])
    names = cat.get_names(missing_prefix="cat")
    assert names == ["cat0-1[x]", "cat0-1[y]"]


def test_split_names_roundtrip():
    split = tm.SplitMatrix(
        [
            tm.DenseMatrix(np.ones((3, 2)), column_names=["d1", "d2"]),
            tm.CategoricalMatrix(["a", "b", "a"], column_name="cat"),
        ]
    )
    assert split.column_names == ["d1", "d2", "cat[a]", "cat[b]"]
    assert split.term_names == ["d1", "d2", "cat", "cat"]
    split.set_names(["n1", "n2", "cat[a]", "cat[b]"], type="column")
    assert split.column_names == ["n1", "n2", "cat[a]", "cat[b]"]


def test_hstack_keeps_dense_type():
    a = tm.DenseMatrix(np.ones((3, 1)))
    b = tm.DenseMatrix(np.zeros((3, 2)))
    out = tm.hstack([a, b])
    assert isinstance(out, tm.DenseMatrix)
    assert out.shape == (3, 3)


def test_hstack_sparse_only():
    a = sps.random(3, 2, density=0.5, random_state=0)
    out = tm.hstack([a, a])
    assert isinstance(out, tm.SparseMatrix)


def test_as_tabmat_types():
    assert isinstance(tm.as_tabmat(np.ones((2, 2))), tm.DenseMatrix)
    assert isinstance(
        tm.as_tabmat(sps.eye(3, format="csr")), tm.SparseMatrix
    )
    dm = tm.DenseMatrix(np.ones((2, 2)))
    assert tm.as_tabmat(dm) is dm
    with pytest.raises(ValueError):
        tm.as_tabmat("nope")


def test_multiply_2d():
    dense = tm.DenseMatrix(np.arange(6.0).reshape(3, 2))
    other = np.arange(6.0).reshape(3, 2) + 1
    np.testing.assert_allclose(
        dense.multiply(other).toarray(), dense.toarray() * other
    )


def test_standardized_getitem_int_row():
    std = tm.StandardizedMatrix(
        tm.DenseMatrix(np.arange(6.0).reshape(3, 2)), [1.0, -1.0], [2.0, 0.5]
    )
    row = std[0]
    np.testing.assert_allclose(np.squeeze(row), std.toarray()[0])


def test_standardized_getcol():
    std = tm.StandardizedMatrix(
        tm.DenseMatrix(np.arange(6.0).reshape(3, 2)), [1.0, -1.0]
    )
    col = std.getcol(1)
    assert isinstance(col, tm.StandardizedMatrix)
    np.testing.assert_allclose(
        np.squeeze(col.toarray()), std.toarray()[:, 1]
    )


def test_transpose_properties():
    dense = tm.DenseMatrix(np.arange(6.0).reshape(3, 2))
    np.testing.assert_allclose(dense.T.toarray(), dense.toarray().T)
    sp = tm.SparseMatrix(sps.eye(3, format="csc"))
    np.testing.assert_allclose(sp.T.toarray(), np.eye(3))


def test_A_property():
    dense = tm.DenseMatrix(np.ones((2, 2)))
    np.testing.assert_allclose(dense.A, dense.toarray())
    std = tm.StandardizedMatrix(dense, [0.0, 0.0])
    np.testing.assert_allclose(std.A, std.toarray())


def test_repr_smoke():
    for mat in [
        tm.DenseMatrix(np.ones((2, 2))),
        tm.CategoricalMatrix(["a", "b"]),
        tm.SplitMatrix([tm.DenseMatrix(np.ones((2, 2)))]),
        tm.StandardizedMatrix(tm.DenseMatrix(np.ones((2, 2))), [0.0, 0.0]),
    ]:
        assert len(repr(mat)) > 0
        assert len(str(mat)) > 0
