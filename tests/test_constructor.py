"""from_df / from_csc routing tests (mirrors reference test_constructor.py)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sps

import tabmat_tpu as tm


@pytest.fixture
def df():
    n = 200
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "dense": rng.standard_normal(n),
            "sparse": np.where(rng.random(n) < 0.05, 1.0, 0.0),
            "cat_big": pd.Categorical(rng.choice(list("abcdefgh"), n)),
            "cat_small": pd.Categorical(rng.choice(["x", "y"], n)),
        }
    )


def test_routing(df):
    X = tm.from_df(df, cat_threshold=4)
    types = [type(m).__name__ for m in X.matrices]
    # cat_big (8 levels) stays categorical; cat_small (2 levels < 4) one-hot
    # splits into dense/sparse parts; numeric columns route by density
    assert "CategoricalMatrix" in types
    assert "DenseMatrix" in types
    assert X.shape == (200, 1 + 1 + 8 + 2)


def test_all_cats_kept_when_threshold_zero(df):
    X = tm.from_df(df, cat_threshold=0)
    n_cat_blocks = sum(
        isinstance(m, tm.CategoricalMatrix) for m in X.matrices
    )
    assert n_cat_blocks == 2


def test_column_order_expand(df):
    X = tm.from_df(df, cat_threshold=4)
    names = X.column_names
    # 'expand' keeps original order: dense, sparse, cat_big[...], cat_small[...]
    assert names[0] == "dense"
    assert names[1] == "sparse"
    assert names[2].startswith("cat_big[")
    assert names[-1].startswith("cat_small[")


def test_column_order_end(df):
    X = tm.from_df(df, cat_position="end", cat_threshold=4)
    names = X.column_names
    assert names[0] == "dense"
    assert names[1] == "sparse"
    assert all(n.startswith("cat_") for n in names[2:])


def test_drop_first(df):
    X = tm.from_df(df, drop_first=True, cat_threshold=4)
    # 8-level cat loses one column; 2-level cat one-hot loses one too
    assert X.shape[1] == 1 + 1 + 7 + 1


def test_toarray_roundtrip(df):
    X = tm.from_df(df, cat_threshold=4)
    arr = X.toarray()
    np.testing.assert_allclose(arr[:, 0], df["dense"].to_numpy(), atol=1e-14)
    dummies = pd.get_dummies(df["cat_big"]).to_numpy(dtype=float)
    np.testing.assert_allclose(arr[:, 2:10], dummies, atol=1e-14)


def test_names_match_get_dummies(df):
    X = tm.from_df(df, cat_threshold=4)
    expected = [f"cat_big[{c}]" for c in df["cat_big"].cat.categories]
    assert X.column_names[2:10] == expected


def test_object_as_cat():
    df = pd.DataFrame({"s": ["a", "b", "a", "c"]})
    X = tm.from_df(df, object_as_cat=True, cat_threshold=0)
    assert isinstance(X, tm.CategoricalMatrix)
    assert X.shape == (4, 3)


def test_dtype_propagation(df):
    X = tm.from_df(df, dtype=np.float32, cat_threshold=4)
    assert np.dtype(X.dtype) == np.float32


def test_missing_cat_methods():
    df = pd.DataFrame({"c": pd.Categorical(["a", None, "b", "a"])})
    with pytest.raises(ValueError):
        tm.from_df(df)
    Xz = tm.from_df(df, cat_missing_method="zero")
    assert Xz.shape[1] == 2
    np.testing.assert_allclose(Xz.toarray()[1], 0)
    Xc = tm.from_df(df, cat_missing_method="convert")
    assert Xc.shape[1] == 3
    assert "(MISSING)" in Xc.column_names[-1]


def test_from_csc():
    rng = np.random.default_rng(0)
    dense_col = rng.standard_normal(100)
    sparse_col = np.where(rng.random(100) < 0.03, 1.0, 0.0)
    mat = sps.csc_matrix(np.column_stack([dense_col, sparse_col]))
    X = tm.from_csc(mat, threshold=0.1)
    assert isinstance(X, tm.SplitMatrix)
    types = {type(m).__name__ for m in X.matrices}
    assert types == {"DenseMatrix", "SparseMatrix"}
    np.testing.assert_allclose(X.toarray(), mat.toarray(), atol=1e-14)


def test_pandas_sparse_dtype():
    df = pd.DataFrame(
        {"s": pd.arrays.SparseArray([0.0, 0.0, 1.0, 0.0]), "d": [1.0, 2.0, 3.0, 4.0]}
    )
    X = tm.from_df(df)
    assert X.shape == (4, 2)
    np.testing.assert_allclose(
        X.toarray(), np.column_stack([[0, 0, 1, 0], [1, 2, 3, 4.0]]), atol=1e-14
    )


def test_bool_routing():
    df = pd.DataFrame({"b": [True] * 90 + [False] * 10})
    X = tm.from_df(df)
    assert isinstance(X, tm.DenseMatrix)


def test_cat_position_end_with_split_categorical():
    """A below-threshold categorical split into dense+sparse parts must get
    consistent global indices under cat_position='end' (regression)."""
    rng = np.random.default_rng(5)
    n = 200
    values = rng.choice(["common", "rare1", "rare2"], n, p=[0.9, 0.05, 0.05])
    df = pd.DataFrame(
        {"num": rng.standard_normal(n), "c": pd.Categorical(values)}
    )
    X = tm.from_df(df, cat_threshold=4, cat_position="end")
    assert X.shape == (n, 4)
    arr = X.toarray()
    names = X.column_names
    assert names[0] == "num"
    dummies = pd.get_dummies(df["c"]).to_numpy(dtype=float)
    cats = sorted(df["c"].cat.categories)
    for j, cat in enumerate(cats):
        col = names.index(f"c[{cat}]")
        np.testing.assert_allclose(arr[:, col], dummies[:, j], atol=1e-14)
