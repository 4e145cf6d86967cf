"""Contrast-coding battery: treatment/sum/helmert/poly/custom via C().

Oracle: hand-built R-convention coding matrices applied to one-hot.
Covers reduced-rank (with intercept) and full-rank positions, base-level
selection, interactions, and stateful out-of-sample re-materialization —
the semantics the reference reaches through formulaic's contrasts
machinery (reference ``tabmat/formula.py:670-711``).
"""

import numpy as np
import pandas as pd
import pytest

import tabmat_tpu as tm
from tabmat_tpu.formula.contrasts import ContrastSpec, contr

LEVELS = ["a", "b", "c", "d"]


@pytest.fixture
def df():
    rng = np.random.default_rng(0)
    n = 60
    return pd.DataFrame(
        {
            "x": rng.standard_normal(n),
            "c": pd.Categorical(
                rng.choice(LEVELS, n), categories=LEVELS
            ),
        }
    )


def _onehot(df):
    return (np.asarray(df["c"].cat.codes)[:, None] == np.arange(4)).astype(
        float
    )


def _sum_M():
    return np.array(
        [[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [-1, -1, -1]]
    )


def _helmert_M():
    return np.array(
        [[-1.0, -1, -1], [1, -1, -1], [0, 2, -1], [0, 0, 3]]
    )


def test_sum_coding_matches_oracle(df):
    X = tm.from_formula("1 + C(c, contr.sum)", df, ensure_full_rank=True)
    arr = np.asarray(X.toarray())
    expected = np.column_stack([np.ones(len(df)), _onehot(df) @ _sum_M()])
    np.testing.assert_allclose(arr, expected, atol=1e-12)
    assert X.column_names[1:] == [
        "C(c, contr.sum)[a]", "C(c, contr.sum)[b]", "C(c, contr.sum)[c]"
    ]


def test_helmert_coding_matches_oracle(df):
    X = tm.from_formula("1 + C(c, contr.helmert)", df, ensure_full_rank=True)
    arr = np.asarray(X.toarray())
    expected = np.column_stack(
        [np.ones(len(df)), _onehot(df) @ _helmert_M()]
    )
    np.testing.assert_allclose(arr, expected, atol=1e-12)
    assert X.column_names[1:] == [
        "C(c, contr.helmert)[b]", "C(c, contr.helmert)[c]", "C(c, contr.helmert)[d]"
    ]


def test_poly_coding_orthonormal_trends(df):
    X = tm.from_formula("1 + C(c, contr.poly)", df, ensure_full_rank=True)
    arr = np.asarray(X.toarray())[:, 1:]
    # R's contr.poly(4): orthonormal columns over points 1..4
    M = np.zeros((4, 3))
    pts = np.arange(1, 5, dtype=float)
    V = np.vander(pts, 4, increasing=True)
    Q, R = np.linalg.qr(V)
    M = (Q * np.sign(np.diag(R)))[:, 1:]
    np.testing.assert_allclose(arr, _onehot(df) @ M, atol=1e-12)
    # orthonormality of the coding itself
    np.testing.assert_allclose(M.T @ M, np.eye(3), atol=1e-12)
    assert X.column_names[1:] == [
        "C(c, contr.poly)[.L]", "C(c, contr.poly)[.Q]", "C(c, contr.poly)[.C]"
    ]


def test_treatment_base_level(df):
    X = tm.from_formula("1 + C(c, contr.treatment('b'))", df, ensure_full_rank=True)
    arr = np.asarray(X.toarray())
    oh = _onehot(df)
    expected = np.column_stack([np.ones(len(df)), oh[:, [0, 2, 3]]])
    np.testing.assert_allclose(arr, expected, atol=1e-12)
    assert [nm[-3:] for nm in X.column_names[1:]] == ["[a]", "[c]", "[d]"]


def test_treatment_default_matches_plain_categorical(df):
    X1 = tm.from_formula("1 + C(c, contr.treatment)", df, ensure_full_rank=True)
    X2 = tm.from_formula("1 + c", df, ensure_full_rank=True)
    np.testing.assert_allclose(
        np.asarray(X1.toarray()), np.asarray(X2.toarray()), atol=1e-14
    )


def test_custom_matrix(df):
    M = np.array([[1.0, 0], [-1, 1], [0, -1], [2, 2]])
    X = tm.from_formula(
        "1 + C(c, contr.custom([[1.0, 0], [-1, 1], [0, -1], [2, 2]]))", df
    )
    arr = np.asarray(X.toarray())[:, 1:]
    np.testing.assert_allclose(arr, _onehot(df) @ M, atol=1e-12)


def test_custom_matrix_literal(df):
    # a bare matrix literal is accepted as the contrasts argument
    X = tm.from_formula(
        "1 + C(c, [[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [-1, -1, -1]])", df
    )
    np.testing.assert_allclose(
        np.asarray(X.toarray())[:, 1:], _onehot(df) @ _sum_M(), atol=1e-12
    )


def test_full_rank_position_spans_with_onehot(df):
    # without an intercept the coded factor keeps the full one-hot basis
    X = tm.from_formula("C(c, contr.sum) - 1", df, ensure_full_rank=True)
    np.testing.assert_allclose(
        np.asarray(X.toarray()), _onehot(df), atol=1e-12
    )


def test_contrast_interaction_with_numeric(df):
    X = tm.from_formula("1 + x + C(c, contr.sum):x", df, ensure_full_rank=True)
    arr = np.asarray(X.toarray())
    x = df["x"].to_numpy()
    coded = _onehot(df) @ _sum_M()
    expected = np.column_stack([np.ones(len(df)), x, coded * x[:, None]])
    np.testing.assert_allclose(arr, expected, atol=1e-12)


def test_stateful_rematerialization(df):
    X = tm.from_formula("1 + C(c, contr.helmert)", df, ensure_full_rank=True)
    spec = X.model_spec
    df2 = df.iloc[:20].copy()
    X2 = spec.get_model_matrix(df2)
    np.testing.assert_allclose(
        np.asarray(X2.toarray()),
        np.asarray(X.toarray())[:20],
        atol=1e-12,
    )
    assert X2.column_names == X.column_names


def test_stateful_rematerialization_treatment_base(df):
    X = tm.from_formula("1 + C(c, contr.treatment('c'))", df, ensure_full_rank=True)
    spec = X.model_spec
    X2 = spec.get_model_matrix(df.iloc[10:40])
    np.testing.assert_allclose(
        np.asarray(X2.toarray()),
        np.asarray(X.toarray())[10:40],
        atol=1e-12,
    )


def test_base_level_not_found_raises(df):
    with pytest.raises(ValueError, match="Base level"):
        tm.from_formula("1 + C(c, contr.treatment('zz'))", df, ensure_full_rank=True)


def test_custom_matrix_wrong_rows_raises(df):
    with pytest.raises(ValueError, match="rows"):
        tm.from_formula("1 + C(c, contr.custom([[1.0], [2.0]]))", df)


def test_contrast_spec_coding_shapes():
    for kind in ("sum", "helmert", "poly"):
        M, labels = ContrastSpec(kind).coding(LEVELS, reduced=True)
        assert M.shape == (4, 3)
        assert len(labels) == 3
        Mf, labels_f = ContrastSpec(kind).coding(LEVELS, reduced=False)
        np.testing.assert_allclose(Mf, np.eye(4))


def test_contr_namespace_callables():
    assert contr.treatment("b").base == "b"
    assert contr.sum().kind == "sum"
    with pytest.raises(ValueError, match="no base"):
        contr.helmert("b")


def test_contrast_missing_zero(df):
    dfm = df.copy()
    dfm.loc[3, "c"] = None
    X = tm.from_formula(
        "1 + C(c, contr.sum, missing_method='zero')", dfm, na_action="ignore"
    )
    arr = np.asarray(X.toarray())
    assert np.allclose(arr[3, 1:], 0.0)
