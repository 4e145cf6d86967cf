"""CategoricalMatrix semantics vs pd.get_dummies (mirrors reference suite)."""

import numpy as np
import pandas as pd
import pytest

import tabmat_tpu as tm


@pytest.mark.parametrize("drop_first", [False, True])
@pytest.mark.parametrize("missing_method", ["fail", "zero", "convert"])
@pytest.mark.parametrize("has_missing", [False, True])
def test_against_get_dummies(drop_first, missing_method, has_missing):
    values = ["a", "b", "c", "a", "b", "a"]
    if has_missing:
        values[2] = None
    series = pd.Series(pd.Categorical(values))

    if has_missing and missing_method == "fail":
        with pytest.raises(ValueError):
            tm.CategoricalMatrix(
                series, drop_first=drop_first, cat_missing_method=missing_method
            )
        return

    cm = tm.CategoricalMatrix(
        series, drop_first=drop_first, cat_missing_method=missing_method
    )
    if missing_method == "convert" and has_missing:
        expected = pd.get_dummies(
            series.cat.add_categories("(MISSING)").fillna("(MISSING)"),
            drop_first=drop_first,
        ).to_numpy(dtype=float)
    else:
        expected = pd.get_dummies(series, drop_first=drop_first).to_numpy(dtype=float)
    np.testing.assert_allclose(cm.toarray(), expected, atol=1e-14)

    # ops against the densified oracle
    rng = np.random.default_rng(0)
    d = rng.random(len(values))
    v = rng.standard_normal(cm.shape[1])
    vr = rng.standard_normal(len(values))
    np.testing.assert_allclose(np.asarray(cm.matvec(v)), expected @ v, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(cm.transpose_matvec(vr)), expected.T @ vr, atol=1e-12
    )
    np.testing.assert_allclose(
        cm.sandwich(d).toarray(), (expected * d[:, None]).T @ expected, atol=1e-12
    )


@pytest.mark.parametrize(
    "vec",
    [
        pd.Series(pd.Categorical(["a", "b", "a"])),
        pd.Categorical(["a", "b", "a"]),
        np.array(["a", "b", "a"], dtype=object),
        ["a", "b", "a"],
    ],
)
def test_extraction_sources(vec):
    cm = tm.CategoricalMatrix(vec)
    assert cm.shape == (3, 2)
    np.testing.assert_array_equal(cm.indices, [0, 1, 0])
    assert list(cm.categories) == ["a", "b"]


def test_pandas_category_order_respected():
    series = pd.Series(pd.Categorical(["b", "a"], categories=["b", "a"]))
    cm = tm.CategoricalMatrix(series)
    assert list(cm.categories) == ["b", "a"]
    np.testing.assert_array_equal(cm.indices, [0, 1])


def test_categories_with_codes():
    cm = tm.CategoricalMatrix(np.array([1, 0, 2]), categories=np.array(["x", "y", "z"]))
    np.testing.assert_array_equal(cm.indices, [1, 0, 2])
    with pytest.raises(ValueError, match="exceed"):
        tm.CategoricalMatrix(np.array([5]), categories=np.array(["x"]))
    with pytest.raises(ValueError, match="non-negative"):
        tm.CategoricalMatrix(np.array([-3]), categories=np.array(["x"]))


def test_recover_orig():
    values = pd.Series(pd.Categorical(["a", None, "b"]))
    cm = tm.CategoricalMatrix(values, cat_missing_method="zero")
    orig = cm.recover_orig()
    assert orig[0] == "a"
    assert np.ma.is_masked(orig[1])


def test_getitem_rows_stays_categorical():
    cm = tm.CategoricalMatrix(["a", "b", "c", "a"])
    sub = cm[np.array([0, 2]), :]
    assert isinstance(sub, tm.CategoricalMatrix)
    assert sub.shape == (2, 3)


def test_getitem_cols_becomes_sparse():
    cm = tm.CategoricalMatrix(["a", "b", "c", "a"])
    sub = cm[:, np.array([0, 1])]
    assert isinstance(sub, tm.SparseMatrix)
    np.testing.assert_allclose(sub.toarray(), cm.toarray()[:, :2], atol=1e-14)


def test_multiply_produces_sparse():
    cm = tm.CategoricalMatrix(["a", "b", "a"])
    w = np.array([2.0, 3.0, 4.0])
    res = cm.multiply(w)
    assert isinstance(res, tm.SparseMatrix)
    np.testing.assert_allclose(res.toarray(), cm.toarray() * w[:, None], atol=1e-14)


def test_names_formatting():
    cm = tm.CategoricalMatrix(["a", "b"], column_name="col")
    assert cm.column_names == ["col[a]", "col[b]"]
    assert cm.term_names == ["col", "col"]
    cm2 = tm.CategoricalMatrix(
        ["a", "b"], column_name="col", column_name_format="{name}__{category}"
    )
    assert cm2.column_names == ["col__a", "col__b"]


def test_set_names_roundtrip():
    cm = tm.CategoricalMatrix(["a", "b"], column_name="col")
    names = cm.column_names
    cm.set_names(names, type="column")
    assert cm._colname == "col"


def test_big_readonly_codes():
    """Kernels must accept read-only buffers (reference test_big_categorical)."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1000, 100_000).astype(np.int32)
    codes.setflags(write=False)
    cm = tm.CategoricalMatrix(codes, categories=np.arange(1000))
    d = rng.random(100_000)
    diag = np.asarray(cm.sandwich(d).diag)
    ref = np.bincount(codes, weights=d, minlength=1000)
    np.testing.assert_allclose(diag, ref, atol=1e-9)


def test_empty_categories():
    cm = tm.CategoricalMatrix(np.array([], dtype=np.int32), categories=np.array(["a"]))
    assert cm.shape == (0, 1)
