"""Dataframe-agnostic ingestion: pyarrow tables through narwhals.

The reference accepts pandas / polars / pyarrow / plain sequences via
narwhals (``tabmat/categorical_matrix.py:221-293``, constructor tests);
polars is absent from this environment, so pyarrow is the non-pandas
backend under test.
"""

import numpy as np
import pandas as pd
import pytest

pa = pytest.importorskip("pyarrow")

import tabmat_tpu as tm


@pytest.fixture()
def columns():
    rng = np.random.default_rng(0)
    return {
        "x": rng.standard_normal(60),
        "b": rng.random(60) < 0.05,  # mostly-zero bool -> sparse route
        "c": rng.choice(list("abc"), 60),
    }


def _pa_table(columns):
    return pa.table(
        {
            "x": columns["x"],
            "b": columns["b"],
            "c": pa.array(columns["c"]).dictionary_encode(),
        }
    )


def _pd_frame(columns):
    return pd.DataFrame(
        {
            "x": columns["x"],
            "b": columns["b"],
            "c": pd.Categorical(columns["c"]),
        }
    )


def test_from_df_pyarrow_matches_pandas(columns):
    X = tm.from_df(_pa_table(columns))
    ref = tm.from_df(_pd_frame(columns))
    assert X.column_names == ref.column_names
    np.testing.assert_array_equal(X.toarray(), ref.toarray())


def test_from_formula_pyarrow_matches_pandas(columns):
    X = tm.from_formula("x + c + x:c", _pa_table(columns))
    ref = tm.from_formula("x + c + x:c", _pd_frame(columns))
    assert X.column_names == ref.column_names
    np.testing.assert_allclose(X.toarray(), ref.toarray(), atol=1e-14)


def test_categorical_matrix_pyarrow_and_list(columns):
    c = columns["c"]
    ref = tm.CategoricalMatrix(pd.Categorical(c))
    for other in (pa.array(c).dictionary_encode(), list(c)):
        cm = tm.CategoricalMatrix(other)
        assert [str(x) for x in cm.categories] == [
            str(x) for x in ref.categories
        ]
        np.testing.assert_array_equal(cm.toarray(), ref.toarray())


def test_pyarrow_null_categories_methods():
    c = ["a", "b", None, "a", None, "c"]
    x = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    tbl = pa.table({"x": x, "c": pa.array(c).dictionary_encode()})
    pdf = pd.DataFrame({"x": x, "c": pd.Categorical(c)})
    for method in ("zero", "convert"):
        X = tm.from_df(tbl, cat_missing_method=method)
        ref = tm.from_df(pdf, cat_missing_method=method)
        assert X.column_names == ref.column_names
        np.testing.assert_array_equal(X.toarray(), ref.toarray())
    with pytest.raises(ValueError, match="missing"):
        tm.from_df(tbl, cat_missing_method="fail")
