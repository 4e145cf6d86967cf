"""Formula engine tests: materialized matrices vs hand-built expectations.

Mirrors the reference's formula test strategy (``tests/test_formula.py``):
numeric/categorical terms, interactions of every kind combination,
intercept handling, full-rank reduction, and stateful out-of-sample
re-materialization.
"""

import numpy as np
import pandas as pd
import pytest

import tabmat_tpu as tm

DF = pd.DataFrame(
    {
        "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "z": [0.5, -0.5, 1.5, 0.0, 2.0, -1.0],
        "cat": pd.Categorical(["a", "b", "a", "c", "b", "a"]),
        "cat2": pd.Categorical(["u", "u", "v", "v", "u", "v"]),
    }
)


def dummies(series):
    return pd.get_dummies(series).to_numpy(dtype=float)


def test_numeric_only():
    res = tm.from_formula("x + z", DF)
    np.testing.assert_allclose(
        res.toarray(), DF[["x", "z"]].to_numpy(), atol=1e-14
    )
    assert res.column_names == ["x", "z"]


def test_intercept():
    res = tm.from_formula("1 + x", DF)
    assert res.column_names == ["Intercept", "x"]
    np.testing.assert_allclose(res.toarray()[:, 0], 1.0)


def test_include_intercept_flag():
    res = tm.from_formula("x", DF, include_intercept=True)
    assert res.column_names[0] == "Intercept"


def test_no_intercept_by_default():
    res = tm.from_formula("x", DF)
    assert res.column_names == ["x"]


def test_remove_intercept():
    res = tm.from_formula("1 + x - 1", DF)
    assert res.column_names == ["x"]


def test_categorical():
    res = tm.from_formula("cat", DF)
    np.testing.assert_allclose(res.toarray(), dummies(DF["cat"]), atol=1e-14)
    assert res.column_names == ["cat[a]", "cat[b]", "cat[c]"]
    assert res.term_names == ["cat"] * 3


def test_numeric_interaction():
    res = tm.from_formula("x:z", DF)
    np.testing.assert_allclose(
        np.squeeze(res.toarray()), (DF["x"] * DF["z"]).to_numpy(), atol=1e-14
    )
    assert res.column_names == ["x:z"]


def test_star_expansion():
    res = tm.from_formula("x*z", DF)
    assert res.column_names == ["x", "z", "x:z"]


def test_cat_numeric_interaction():
    res = tm.from_formula("cat:x", DF)
    expected = dummies(DF["cat"]) * DF["x"].to_numpy()[:, None]
    np.testing.assert_allclose(res.toarray(), expected, atol=1e-14)
    assert res.column_names == ["cat[a]:x", "cat[b]:x", "cat[c]:x"]


def test_cat_cat_interaction():
    res = tm.from_formula("cat:cat2", DF)
    names = res.column_names
    arr = res.toarray()
    d1, d2 = dummies(DF["cat"]), dummies(DF["cat2"])
    # every product column must be present (order: right-major like reference)
    for j, c2 in enumerate(["u", "v"]):
        for i, c1 in enumerate(["a", "b", "c"]):
            col = names.index(f"cat[{c1}]:cat2[{c2}]")
            np.testing.assert_allclose(arr[:, col], d1[:, i] * d2[:, j], atol=1e-14)


def test_full_rank_reduction():
    res = tm.from_formula("cat", DF, ensure_full_rank=True, include_intercept=True)
    # intercept + (3-1) categories
    assert res.shape[1] == 3
    assert res.column_names == ["Intercept", "cat[b]", "cat[c]"]
    expected = dummies(DF["cat"])[:, 1:]
    np.testing.assert_allclose(res.toarray()[:, 1:], expected, atol=1e-14)


def test_full_rank_without_intercept_keeps_all():
    res = tm.from_formula("cat", DF, ensure_full_rank=True)
    assert res.shape[1] == 3


def test_function_transform():
    res = tm.from_formula("np.log(x)", DF)
    np.testing.assert_allclose(
        np.squeeze(res.toarray()), np.log(DF["x"].to_numpy()), atol=1e-14
    )


def test_context_capture():
    my_scale = 10.0  # noqa: F841
    res = tm.from_formula("I(my_scale * x)", DF, context=0)
    np.testing.assert_allclose(
        np.squeeze(res.toarray()), 10.0 * DF["x"].to_numpy(), atol=1e-14
    )


def test_C_coercion():
    df = pd.DataFrame({"n": [1, 2, 1, 3, 2, 1]})
    res = tm.from_formula("C(n)", df)
    assert res.shape[1] == 3
    np.testing.assert_allclose(res.toarray().sum(1), 1.0)


def test_stateful_rematerialization():
    res = tm.from_formula("cat + x", DF)
    spec = res.model_spec
    new_df = pd.DataFrame(
        {
            "x": [7.0, 8.0],
            "cat": pd.Categorical(["b", "a"], categories=["a", "b", "c"]),
        }
    )
    res2 = spec.get_model_matrix(new_df)
    assert res2.column_names == res.column_names
    expected = np.array([[0, 1, 0, 7.0], [1, 0, 0, 8.0]])
    np.testing.assert_allclose(res2.toarray(), expected, atol=1e-14)


def test_unseen_category_raises():
    res = tm.from_formula("cat", DF)
    new_df = pd.DataFrame({"cat": pd.Categorical(["zzz"])})
    with pytest.raises(ValueError, match="unseen"):
        res.model_spec.get_model_matrix(new_df)


def test_sandwich_on_formula_matrix():
    res = tm.from_formula("1 + x + cat + x:z", DF, ensure_full_rank=True)
    arr = res.toarray()
    d = np.random.default_rng(0).random(6)
    np.testing.assert_allclose(
        res.sandwich(d), (arr * d[:, None]).T @ arr, atol=1e-12
    )


def test_na_drop():
    df = DF.copy()
    df.loc[2, "x"] = np.nan
    res = tm.from_formula("x", df, na_action="drop")
    assert res.shape[0] == 5


def test_na_raise():
    df = DF.copy()
    df.loc[2, "x"] = np.nan
    with pytest.raises(ValueError, match="Missing values"):
        tm.from_formula("x", df, na_action="raise")


def test_formula_parse_errors():
    with pytest.raises(ValueError):
        tm.from_formula("x +", DF)
    with pytest.raises(ValueError):
        tm.from_formula("(x", DF)


def test_power_expansion():
    res = tm.from_formula("(x + z)**2", DF)
    assert res.column_names == ["x", "z", "x:z"]
    arr = res.toarray()
    np.testing.assert_allclose(
        arr[:, 2], (DF["x"] * DF["z"]).to_numpy(), atol=1e-14
    )


def test_power_three_way():
    df = DF.assign(w=np.arange(6.0))
    res = tm.from_formula("(x + z + w)**3", df)
    # 3 mains + 3 pairwise + 1 triple
    assert res.shape[1] == 7
    assert "x:z:w" in res.column_names


def test_nesting():
    res = tm.from_formula("x / z", DF)
    assert res.column_names == ["x", "x:z"]


def test_nesting_categorical():
    res = tm.from_formula("cat / x", DF)
    names = res.column_names
    assert names[:3] == ["cat[a]", "cat[b]", "cat[c]"]
    assert len(names) == 6  # 3 cat + 3 cat:x
