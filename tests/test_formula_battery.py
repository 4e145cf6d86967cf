"""Reference-derived formula battery.

Adapted case-by-case from the reference's ``tests/test_formula.py`` (1294
lines): matrix-vs-expectation grids, name/term-name expectations, custom
separators/formats, include_intercept equivalences, C() state across
re-materialization, the interaction algebra grid over slot kinds, the
missing-category suites (zero/convert/fail × seen/unseen), numeric levels,
drop-all-levels, and the vendored-formulaic structural cases
(reference ``test_formula.py:948-1069``).

The reference cross-checks against ``formulaic``; that package (and polars)
is unavailable here, so expectations are hand-pinned to the same values and
every test is parametrized over ["pandas", "polars"] with polars cases
skipped when the import is missing — they activate unchanged once polars is
present (the engine consumes dataframes through narwhals either way).
"""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sps

import tabmat_tpu as tm
from tabmat_tpu.formula.engine import (
    CategoricalSlot,
    MultiNumericSlot,
    NumericSlot,
    interact,
)

try:
    import polars as pl

    HAS_POLARS = True
except ImportError:
    HAS_POLARS = False

try:
    import pyarrow as pa

    HAS_PYARROW = True
except ImportError:
    HAS_PYARROW = False

INPUTS = [
    "pandas",
    pytest.param(
        "polars",
        marks=pytest.mark.skipif(not HAS_POLARS, reason="polars not installed"),
    ),
    pytest.param(
        "pyarrow",
        marks=pytest.mark.skipif(
            not HAS_PYARROW, reason="pyarrow not installed"
        ),
    ),
]


def _make_df(input):
    df = pd.DataFrame(
        {
            "num_1": [1.0, 2.0, 3.0, 4.0, 5.0],
            "num_2": [5.0, 4.0, 3.0, 2.0, 1.0],
            "cat_1": pd.Categorical(["a", "b", "c", "b", "a"]),
            "cat_2": pd.Categorical(["x", "y", "z", "x", "y"]),
            "cat_3": pd.Categorical(["1", "2", "1", "2", "1"]),
            "str_1": ["a", "b", "c", "b", "a"],
        }
    )
    if input == "polars":
        return pl.DataFrame(df)
    if input == "pyarrow":
        # categoricals survive as Arrow dictionary columns
        return pa.Table.from_pandas(df, preserve_index=False)
    return df


@pytest.fixture
def df(input):
    return _make_df(input)


# ----------------------------------------------------------------------
# matrices against expectations (reference test_formula.py:60-292)
# ----------------------------------------------------------------------

EXPECTATION_CASES = [
    pytest.param(
        "1 + num_1",
        [np.array([[1.0] * 5, [1.0, 2.0, 3.0, 4.0, 5.0]]).T],
        ["dense"],
        id="numeric",
    ),
    pytest.param(
        "1 + cat_1",
        [
            np.array([[1.0] * 5]).T,
            np.array(
                [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 0.0]]
            ),
        ],
        ["dense", "categorical"],
        id="categorical",
    ),
    pytest.param(
        "1 + num_1 : cat_1",
        [
            np.array([[1.0] * 5]).T,
            np.array(
                [
                    [1.0, 0.0, 0.0],
                    [0.0, 2.0, 0.0],
                    [0.0, 0.0, 3.0],
                    [0.0, 4.0, 0.0],
                    [5.0, 0.0, 0.0],
                ]
            ),
        ],
        ["dense", "sparse"],
        id="interaction_cat_num",
    ),
    pytest.param(
        "cat_1 : cat_3 - 1",
        [
            # product categories, left-fastest: a:1 b:1 c:1 a:2 b:2 c:2
            np.array(
                [
                    [1, 0, 0, 0, 0, 0],
                    [0, 0, 0, 0, 1, 0],
                    [0, 0, 1, 0, 0, 0],
                    [0, 0, 0, 0, 1, 0],
                    [1, 0, 0, 0, 0, 0],
                ],
                dtype=float,
            )
        ],
        ["categorical"],
        id="interaction_cat_cat",
    ),
]


@pytest.mark.parametrize("formula, expected_blocks, expected_kinds", EXPECTATION_CASES)
@pytest.mark.parametrize("input", INPUTS)
def test_matrix_against_expectation(df, formula, expected_blocks, expected_kinds):
    model_df = tm.from_formula(
        formula, df, ensure_full_rank=True, cat_threshold=1, sparse_threshold=0.5
    )
    kind_of = {
        tm.DenseMatrix: "dense",
        tm.SparseMatrix: "sparse",
        tm.CategoricalMatrix: "categorical",
    }
    assert len(model_df.matrices) == len(expected_blocks)
    for res, exp, kind in zip(model_df.matrices, expected_blocks, expected_kinds):
        assert kind_of[type(res)] == kind
        np.testing.assert_array_equal(np.asarray(res.toarray()), exp)


@pytest.mark.parametrize("input", INPUTS)
def test_matrix_sparse_braces(df):
    """Brace factors route by density (reference ``numeric_sparse`` case)."""
    model_df = tm.from_formula(
        "{np.where(num_1 >= 2, num_1, 0)} + {np.where(num_2 <= 2, num_2, 0)} - 1",
        df,
        sparse_threshold=0.5,
    )
    arr = np.asarray(model_df.toarray())
    np.testing.assert_array_equal(arr[:, 0], [0.0, 2.0, 3.0, 4.0, 5.0])
    np.testing.assert_array_equal(arr[:, 1], [0.0, 0.0, 0.0, 2.0, 1.0])
    kinds = [type(m).__name__ for m in model_df.matrices]
    assert "SparseMatrix" in kinds


@pytest.mark.parametrize("input", INPUTS)
def test_matrix_against_expectation_qcl(df):
    """Custom separator/format/intercept names (reference :183-292)."""
    model_df = tm.from_formula(
        "1 + cat_1 + num_1:cat_3",
        df,
        cat_threshold=1,
        sparse_threshold=0.5,
        ensure_full_rank=True,
        interaction_separator="__x__",
        categorical_format="{name}__{category}",
        intercept_name="intercept",
    )
    assert model_df.column_names[0] == "intercept"
    assert model_df.column_names[1] == "cat_1__b"
    assert model_df.column_names[2] == "cat_1__c"
    assert "__x__" in model_df.column_names[3]


# ----------------------------------------------------------------------
# names against expectations (reference :341-463)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "formula, expected_names",
    [
        pytest.param(
            "1 + num_1 + num_2", ("Intercept", "num_1", "num_2"), id="numeric"
        ),
        pytest.param("num_1 + num_2 - 1", ("num_1", "num_2"), id="no_intercept"),
        pytest.param(
            "1 + cat_1", ("Intercept", "cat_1[b]", "cat_1[c]"), id="categorical"
        ),
        pytest.param(
            "1 + cat_2 * cat_3",
            (
                "Intercept",
                "cat_2[y]",
                "cat_2[z]",
                "cat_3[2]",
                "cat_2[y]:cat_3[2]",
                "cat_2[z]:cat_3[2]",
            ),
            id="interaction",
        ),
        pytest.param(
            "poly(num_1, 3) - 1",
            ("poly(num_1, 3)[1]", "poly(num_1, 3)[2]", "poly(num_1, 3)[3]"),
            id="polynomial",
        ),
        pytest.param(
            "1 + {np.log(num_1 ** 2)}",
            ("Intercept", "np.log(num_1 ** 2)"),
            id="functions",
        ),
    ],
)
@pytest.mark.parametrize("input", INPUTS)
def test_names_against_expectation(df, formula, expected_names):
    model_tabmat = tm.from_formula(formula, df, ensure_full_rank=True)
    assert model_tabmat.model_spec.column_names == expected_names
    assert model_tabmat.column_names == list(expected_names)


@pytest.mark.parametrize(
    "formula, expected_names",
    [
        pytest.param(
            "1 + cat_1", ("intercept", "cat_1__b", "cat_1__c"), id="categorical"
        ),
        pytest.param(
            "1 + cat_2 * cat_3",
            (
                "intercept",
                "cat_2__y",
                "cat_2__z",
                "cat_3__2",
                "cat_2__y__x__cat_3__2",
                "cat_2__z__x__cat_3__2",
            ),
            id="interaction",
        ),
        pytest.param(
            "poly(num_1, 3) - 1",
            ("poly(num_1, 3)[1]", "poly(num_1, 3)[2]", "poly(num_1, 3)[3]"),
            id="polynomial",
        ),
        pytest.param(
            "1 + {np.log(num_1 ** 2)}",
            ("intercept", "np.log(num_1 ** 2)"),
            id="functions",
        ),
    ],
)
@pytest.mark.parametrize("input", INPUTS)
def test_names_against_expectation_qcl(df, formula, expected_names):
    model_tabmat = tm.from_formula(
        formula,
        df,
        ensure_full_rank=True,
        categorical_format="{name}__{category}",
        interaction_separator="__x__",
        intercept_name="intercept",
    )
    assert model_tabmat.model_spec.column_names == expected_names
    assert model_tabmat.column_names == list(expected_names)


@pytest.mark.parametrize(
    "formula, expected_names",
    [
        pytest.param("1 + cat_1", ("1", "cat_1", "cat_1"), id="categorical"),
        pytest.param(
            "1 + cat_2 * cat_3",
            ("1", "cat_2", "cat_2", "cat_3", "cat_2:cat_3", "cat_2:cat_3"),
            id="interaction",
        ),
        pytest.param(
            "poly(num_1, 3) - 1",
            ("poly(num_1, 3)", "poly(num_1, 3)", "poly(num_1, 3)"),
            id="polynomial",
        ),
        pytest.param(
            "1 + {np.log(num_1 ** 2)}",
            ("1", "np.log(num_1 ** 2)"),
            id="functions",
        ),
    ],
)
@pytest.mark.parametrize("input", INPUTS)
def test_term_names_against_expectation(df, formula, expected_names):
    """Intercept term name is "1" (reference :426-462)."""
    model_tabmat = tm.from_formula(
        formula, df, ensure_full_rank=True, intercept_name="intercept"
    )
    assert model_tabmat.term_names == list(expected_names)


@pytest.mark.parametrize(
    "categorical_format",
    ["{name}[{category}]", "{name}__{category}", "{name}<<{category}>>"],
    ids=["brackets", "double_underscore", "custom"],
)
@pytest.mark.parametrize("input", INPUTS)
def test_all_names_against_from_df(df, categorical_format, input):
    """from_formula and from_df agree on names (reference :465-483)."""
    mat_from_df = tm.from_df(
        df,
        drop_first=False,
        object_as_cat=True,
        categorical_format=categorical_format,
    )
    mat_from_formula = tm.from_formula(
        "num_1 + num_2 + cat_1 + cat_2 + cat_3 + str_1 - 1",
        data=df,
        ensure_full_rank=False,
        categorical_format=categorical_format,
    )
    assert mat_from_formula.column_names == mat_from_df.column_names
    assert mat_from_formula.term_names == mat_from_df.term_names


# ----------------------------------------------------------------------
# include_intercept equivalences (reference :539-589)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "ensure_full_rank", [True, False], ids=["full_rank", "all_levels"]
)
@pytest.mark.parametrize(
    "formula, formula_with_intercept, formula_wo_intercept",
    [
        ("num_1", "1 + num_1", "num_1 - 1"),
        ("cat_1", "1 + cat_1", "cat_1 - 1"),
        (
            "num_1 * cat_1 * cat_2",
            "1 + num_1 * cat_1 * cat_2",
            "num_1 * cat_1 * cat_2 - 1",
        ),
    ],
    ids=["numeric", "categorical", "mixed"],
)
@pytest.mark.parametrize("input", INPUTS)
def test_include_intercept(
    df, formula, formula_with_intercept, formula_wo_intercept, ensure_full_rank
):
    model_no_include = tm.from_formula(
        formula, df, include_intercept=False, ensure_full_rank=ensure_full_rank
    )
    model_no_intercept = tm.from_formula(
        formula_wo_intercept,
        df,
        include_intercept=True,
        ensure_full_rank=ensure_full_rank,
    )
    np.testing.assert_array_equal(
        np.asarray(model_no_include.toarray()),
        np.asarray(model_no_intercept.toarray()),
    )
    assert (
        model_no_include.model_spec.column_names
        == model_no_intercept.model_spec.column_names
    )

    model_include = tm.from_formula(
        formula, df, include_intercept=True, ensure_full_rank=ensure_full_rank
    )
    model_intercept = tm.from_formula(
        formula_with_intercept,
        df,
        include_intercept=False,
        ensure_full_rank=ensure_full_rank,
    )
    np.testing.assert_array_equal(
        np.asarray(model_include.toarray()), np.asarray(model_intercept.toarray())
    )


# ----------------------------------------------------------------------
# stateful C() re-materialization (reference :592-614)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "ensure_full_rank", [True, False], ids=["full_rank", "all_levels"]
)
@pytest.mark.parametrize("input", INPUTS)
def test_C_state(df, ensure_full_rank, input):
    model_tabmat = tm.from_formula(
        "str_1 : cat_1 + 1", df, cat_threshold=0, ensure_full_rank=ensure_full_rank
    )
    sub = _make_df(input)[:2]
    model_tabmat_2 = model_tabmat.model_spec.get_model_matrix(sub)
    np.testing.assert_array_equal(
        np.asarray(model_tabmat.toarray())[:2, :],
        np.asarray(model_tabmat_2.toarray()),
    )
    assert model_tabmat_2.column_names == model_tabmat.column_names


# ----------------------------------------------------------------------
# interaction algebra over slot kinds (reference :617-685)
# ----------------------------------------------------------------------


def _slot_instances():
    dense = NumericSlot(np.array([1.0, 2.0, 3.0, 4.0, 5.0]), "dense")
    multi = MultiNumericSlot(
        np.array([[1.0, 0.0], [2.0, 1.0], [3.0, 0.0], [4.0, 1.0], [5.0, 0.0]]),
        labels=["1", "2"],
        name="basis",
    )
    cat_full = CategoricalSlot(
        codes=np.array([0, 1, 2, 1, 0], dtype=np.int64),
        categories=["a", "b", "c"],
        multipliers=np.ones(5),
        name="cat_full",
    )
    cat_reduced = CategoricalSlot(
        codes=np.array([-2, 0, 1, 0, -2], dtype=np.int64),
        categories=["b", "c"],
        multipliers=np.ones(5),
        name="cat_reduced",
    )
    return {
        "dense": dense,
        "multi": multi,
        "cat_full": cat_full,
        "cat_reduced": cat_reduced,
    }


def _slot_to_array(slot):
    if isinstance(slot, NumericSlot):
        return slot.values[:, None]
    if isinstance(slot, MultiNumericSlot):
        return slot.values
    n = len(slot.codes)
    out = np.zeros((n, len(slot.categories)))
    live = slot.codes >= 0
    out[np.arange(n)[live], slot.codes[live]] = slot.multipliers[live]
    return out


@pytest.mark.parametrize("left_key", ["dense", "multi", "cat_full", "cat_reduced"])
@pytest.mark.parametrize("right_key", ["dense", "multi", "cat_full", "cat_reduced"])
def test_interact_slots(left_key, right_key):
    """Value-level parity of the interaction algebra (reference :637-685).

    cat × multi spreads into a BundleSlot of per-basis-column categorical
    interactions; verified against the dense outer product.
    """
    from tabmat_tpu.formula.engine import BundleSlot

    slots = _slot_instances()
    left, right = slots[left_key], slots[right_key]
    is_cat = lambda s: isinstance(s, CategoricalSlot)  # noqa: E731
    is_multi = lambda s: isinstance(s, MultiNumericSlot)  # noqa: E731

    if (is_cat(left) and is_multi(right)) or (is_multi(left) and is_cat(right)):
        result = interact(left, right)
        assert isinstance(result, BundleSlot)
        got = np.column_stack([_slot_to_array(m) for m in result.members])
        left_np, right_np = _slot_to_array(left), _slot_to_array(right)
        multi_np, cat_np = (
            (left_np, right_np) if is_multi(left) else (right_np, left_np)
        )
        # basis-major, category-fastest
        expected = np.column_stack(
            [
                multi_np[:, i] * cat_np[:, j]
                for i in range(multi_np.shape[1])
                for j in range(cat_np.shape[1])
            ]
        )
        np.testing.assert_allclose(got, expected, rtol=1e-12)
        return

    result = interact(left, right)
    left_np, right_np = _slot_to_array(left), _slot_to_array(right)

    if is_cat(left) and is_cat(right):
        n = left_np.shape[0]
        expected = np.zeros((n, left_np.shape[1] * right_np.shape[1]))
        for j in range(right_np.shape[1]):
            for i in range(left_np.shape[1]):
                expected[:, j * left_np.shape[1] + i] = (
                    left_np[:, i] * right_np[:, j]
                )
    elif left_np.shape[1] == 1 or right_np.shape[1] == 1:
        expected = left_np * right_np if right_np.shape[1] >= 1 else None
        if left_np.shape[1] == 1:
            expected = left_np * right_np
        else:
            expected = left_np * right_np  # broadcast over single right col
    else:
        # multi × multi: all column pairs, left fastest
        cols = [
            left_np[:, i] * right_np[:, j]
            for j in range(right_np.shape[1])
            for i in range(left_np.shape[1])
        ]
        expected = np.column_stack(cols)

    np.testing.assert_array_equal(_slot_to_array(result).squeeze(), expected.squeeze())
    assert result.name == f"{left.name}:{right.name}"


# ----------------------------------------------------------------------
# missing-category suites (reference :688-931)
# ----------------------------------------------------------------------


def _cat_df(input, values=("a", "b", None, "b", "a")):
    df = pd.DataFrame({"cat_1": pd.Categorical(list(values))})
    if input == "polars":
        return pl.DataFrame(df)
    return df


@pytest.mark.parametrize("cat_missing_method", ["zero", "convert"])
@pytest.mark.parametrize("cat_missing_name", ["__missing__", "(MISSING)"])
@pytest.mark.parametrize("input", INPUTS)
def test_cat_missing_handling(cat_missing_method, cat_missing_name, input):
    df = _cat_df(input)
    mat_from_df = tm.from_df(
        df,
        cat_threshold=0,
        cat_missing_method=cat_missing_method,
        cat_missing_name=cat_missing_name,
    )
    mat_from_formula = tm.from_formula(
        "cat_1 - 1",
        df,
        cat_threshold=0,
        cat_missing_method=cat_missing_method,
        cat_missing_name=cat_missing_name,
    )
    assert mat_from_df.column_names == mat_from_formula.column_names
    assert mat_from_df.term_names == mat_from_formula.term_names
    np.testing.assert_array_equal(
        np.asarray(mat_from_df.toarray()), np.asarray(mat_from_formula.toarray())
    )

    mat_new = mat_from_formula.model_spec.get_model_matrix(df)
    assert mat_from_df.column_names == mat_new.column_names
    np.testing.assert_array_equal(
        np.asarray(mat_from_df.toarray()), np.asarray(mat_new.toarray())
    )


@pytest.mark.parametrize("input", INPUTS)
def test_cat_missing_C(input):
    df = pd.DataFrame(
        {
            "cat_1": pd.Categorical(["a", "b", None, "b", "a"]),
            "cat_2": pd.Categorical(["1", "2", None, "1", "2"]),
        }
    )
    if input == "polars":
        df = pl.DataFrame(df)
    formula = (
        "C(cat_1, missing_method='convert', missing_name='M') "
        "+ C(cat_2, missing_method='zero')"
    )
    expected_names = [
        "C(cat_1, missing_method='convert', missing_name='M')[a]",
        "C(cat_1, missing_method='convert', missing_name='M')[b]",
        "C(cat_1, missing_method='convert', missing_name='M')[M]",
        "C(cat_2, missing_method='zero')[1]",
        "C(cat_2, missing_method='zero')[2]",
    ]
    result = tm.from_formula(formula, df)
    assert result.column_names == expected_names
    assert result.model_spec.get_model_matrix(df).column_names == expected_names
    np.testing.assert_equal(
        np.asarray(result.model_spec.get_model_matrix(df).toarray()),
        np.asarray(result.toarray()),
    )


@pytest.mark.parametrize("input", INPUTS)
def test_numeric_levels_with_numeric_data(input):
    """Numeric levels with numeric data (reference regression :766-807)."""
    df = pd.DataFrame({"num_cat": [1, 2, 3, 2, 1]})
    if input == "polars":
        df = pl.DataFrame(df)
    formula = "C(num_cat, levels=[1, 2, 3]) - 1"
    result = tm.from_formula(formula, df)
    expected_names = [
        "C(num_cat, levels=[1, 2, 3])[1]",
        "C(num_cat, levels=[1, 2, 3])[2]",
        "C(num_cat, levels=[1, 2, 3])[3]",
    ]
    assert result.column_names == expected_names
    expected_array = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float64
    )
    np.testing.assert_array_equal(np.asarray(result.toarray()), expected_array)
    result_repl = result.model_spec.get_model_matrix(df)
    np.testing.assert_array_equal(np.asarray(result_repl.toarray()), expected_array)
    assert result_repl.column_names == expected_names


@pytest.mark.parametrize(
    "cat_missing_method", ["zero", "convert"], ids=["zero", "convert"]
)
@pytest.mark.parametrize("input", INPUTS)
def test_cat_missing_unseen(cat_missing_method, input):
    df = _cat_df(input)
    df_unseen = _cat_df(input, values=("a", None))
    result_seen = tm.from_formula(
        "cat_1 - 1", df, cat_missing_method=cat_missing_method
    )
    result_unseen = result_seen.model_spec.get_model_matrix(df_unseen)
    assert result_seen.column_names == result_unseen.column_names
    if cat_missing_method == "convert":
        expected_array = np.array([[1, 0, 0], [0, 0, 1]], dtype=np.float64)
    else:
        expected_array = np.array([[1, 0], [0, 0]], dtype=np.float64)
    np.testing.assert_array_equal(
        np.asarray(result_unseen.toarray()), expected_array
    )


@pytest.mark.parametrize("input", INPUTS)
def test_cat_missing_interactions(input):
    df = pd.DataFrame(
        {
            "cat_1": pd.Categorical(["a", "b", None, "b", "a"]),
            "cat_2": pd.Categorical(["1", "2", None, "1", "2"]),
        }
    )
    if input == "polars":
        df = pl.DataFrame(df)
    formula = (
        "C(cat_1, missing_method='convert') : C(cat_2, missing_method='zero') - 1"
    )
    expected_names = [
        "C(cat_1, missing_method='convert')[a]:C(cat_2, missing_method='zero')[1]",
        "C(cat_1, missing_method='convert')[b]:C(cat_2, missing_method='zero')[1]",
        "C(cat_1, missing_method='convert')[(MISSING)]:"
        "C(cat_2, missing_method='zero')[1]",
        "C(cat_1, missing_method='convert')[a]:C(cat_2, missing_method='zero')[2]",
        "C(cat_1, missing_method='convert')[b]:C(cat_2, missing_method='zero')[2]",
        "C(cat_1, missing_method='convert')[(MISSING)]:"
        "C(cat_2, missing_method='zero')[2]",
    ]
    assert tm.from_formula(formula, df).column_names == expected_names


@pytest.mark.parametrize(
    "cat_missing_method", ["zero", "convert", "fail"], ids=["zero", "convert", "fail"]
)
@pytest.mark.parametrize("input", INPUTS)
def test_unseen_category(cat_missing_method, input):
    df = _cat_df(input, values=("a", "b"))
    df_unseen = _cat_df(input, values=("a", "b", "c"))
    result_seen = tm.from_formula(
        "cat_1 - 1", df, cat_missing_method=cat_missing_method
    )
    with pytest.raises(ValueError, match="contains unseen categories"):
        result_seen.model_spec.get_model_matrix(df_unseen)


@pytest.mark.parametrize("cat_missing_method", ["zero", "convert", "fail"])
@pytest.mark.parametrize("input", INPUTS)
def test_unseen_missing(cat_missing_method, input):
    df = _cat_df(input, values=("a", "b"))
    df_unseen = _cat_df(input, values=("a", "b", None))
    result_seen = tm.from_formula(
        "cat_1 - 1", df, cat_missing_method=cat_missing_method
    )
    if cat_missing_method == "convert":
        with pytest.raises(ValueError, match="contains unseen categories"):
            result_seen.model_spec.get_model_matrix(df_unseen)
    elif cat_missing_method == "fail":
        with pytest.raises(
            ValueError, match="Categorical data can't have missing values"
        ):
            result_seen.model_spec.get_model_matrix(df_unseen)
    else:
        result_unseen = result_seen.model_spec.get_model_matrix(df_unseen)
        assert np.asarray(result_unseen.toarray()).shape == (3, 2)
        np.testing.assert_array_equal(
            np.asarray(result_unseen.toarray()),
            np.array([[1, 0], [0, 1], [0, 0]]),
        )
        assert result_unseen.column_names == ["cat_1[a]", "cat_1[b]"]


def test_drop_all_levels():
    df = pd.DataFrame(
        {"cat_1": pd.Categorical(["A", "A", "A"], categories=["A", "B"])}
    )
    X = tm.from_formula("C(cat_1) + 1", df, ensure_full_rank=True)
    X_repl = X.model_spec.get_model_matrix(df)
    np.testing.assert_array_equal(
        np.asarray(X.toarray()), np.asarray(X_repl.toarray())
    )


# ----------------------------------------------------------------------
# basis factors: poly() and bs() (reference :294-338 "native" grid)
# ----------------------------------------------------------------------


@pytest.mark.parametrize("input", INPUTS)
def test_poly_raw_values(df):
    result = tm.from_formula("poly(num_1, 3, raw=True) - 1", df)
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    np.testing.assert_allclose(
        np.asarray(result.toarray()), np.column_stack([x, x**2, x**3])
    )


@pytest.mark.parametrize("input", INPUTS)
def test_poly_orthogonal_properties(df):
    """Orthogonal poly: orthonormal, mean-zero, degree-ordered (R semantics)."""
    result = tm.from_formula("poly(num_1, 3) - 1", df)
    Z = np.asarray(result.toarray())
    np.testing.assert_allclose(Z.T @ Z, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(Z.sum(axis=0), 0.0, atol=1e-12)
    # column k spans polynomials of exactly degree k: leading column is
    # a linear rescaling of x
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    c = np.corrcoef(Z[:, 0], x)[0, 1]
    assert abs(abs(c) - 1.0) < 1e-12


@pytest.mark.parametrize("input", INPUTS)
def test_poly_state(df):
    """Out-of-sample poly evaluation uses the training coefficients."""
    result = tm.from_formula("poly(num_1, 2) - 1", df)
    sub = _make_df("pandas").iloc[[0, 2, 4]]
    repl = result.model_spec.get_model_matrix(sub)
    np.testing.assert_allclose(
        np.asarray(repl.toarray()),
        np.asarray(result.toarray())[[0, 2, 4]],
        atol=1e-12,
    )


@pytest.mark.parametrize("input", INPUTS)
def test_bs_values(df):
    """bs(x, 3): cubic basis, rows sum to 1 - the dropped intercept column."""
    result = tm.from_formula("bs(num_1, 3) - 1", df)
    B = np.asarray(result.toarray())
    assert B.shape == (5, 3)
    assert np.all(B >= -1e-12)
    repl = result.model_spec.get_model_matrix(_make_df("pandas")[:3])
    np.testing.assert_allclose(np.asarray(repl.toarray()), B[:3], atol=1e-12)


@pytest.mark.parametrize("input", INPUTS)
def test_poly_interaction_with_numeric(df):
    result = tm.from_formula("poly(num_1, 2, raw=True):num_2 - 1", df)
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    z = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(result.toarray()), np.column_stack([x * z, x**2 * z])
    )
    assert result.column_names == [
        "poly(num_1, 2, raw=True)[1]:num_2",
        "poly(num_1, 2, raw=True)[2]:num_2",
    ]


# ----------------------------------------------------------------------
# vendored-formulaic structural cases (reference :948-1069)
# ----------------------------------------------------------------------

FORMULAIC_TESTS = {
    # formula: (full_rank_names, names, full_rank_null_names, null_rows)
    "a": (["Intercept", "a"], ["Intercept", "a"], ["Intercept", "a"], 2),
    "A": (
        ["Intercept", "A[b]", "A[c]"],
        ["Intercept", "A[a]", "A[b]", "A[c]"],
        ["Intercept", "A[c]"],
        2,
    ),
    "C(A)": (
        ["Intercept", "C(A)[b]", "C(A)[c]"],
        ["Intercept", "C(A)[a]", "C(A)[b]", "C(A)[c]"],
        ["Intercept", "C(A)[c]"],
        2,
    ),
    "A:a": (
        ["Intercept", "A[a]:a", "A[b]:a", "A[c]:a"],
        ["Intercept", "A[a]:a", "A[b]:a", "A[c]:a"],
        ["Intercept", "A[a]:a"],
        1,
    ),
}


def _formulaic_data(input):
    df = pd.DataFrame(
        {"a": [1, 2, 3], "b": [1, 2, 3], "A": ["a", "b", "c"], "B": ["a", "b", "c"]}
    )
    if input == "polars":
        return pl.DataFrame(df)
    return df


def _formulaic_data_with_nulls(input):
    df = pd.DataFrame(
        {"a": [1.0, 2.0, None], "A": ["a", None, "c"], "B": ["a", "b", None]}
    )
    if input == "polars":
        return pl.DataFrame(df)
    return df


@pytest.mark.parametrize("input", INPUTS)
@pytest.mark.parametrize("formula,tests", FORMULAIC_TESTS.items())
def test_formulaic_get_model_matrix(input, formula, tests):
    data = _formulaic_data(input)
    mm = tm.from_formula(formula, data, ensure_full_rank=True, include_intercept=True)
    assert mm.shape == (3, len(tests[0]))
    assert list(mm.model_spec.column_names) == tests[0]

    mm = tm.from_formula(formula, data, ensure_full_rank=False, include_intercept=True)
    assert mm.shape == (3, len(tests[1]))
    assert list(mm.model_spec.column_names) == tests[1]


@pytest.mark.parametrize("input", INPUTS)
@pytest.mark.parametrize("formula,tests", FORMULAIC_TESTS.items())
def test_formulaic_na_handling(input, formula, tests):
    data = _formulaic_data_with_nulls(input)
    mm = tm.from_formula(
        formula,
        data,
        ensure_full_rank=True,
        include_intercept=True,
        cat_missing_method="zero",
        na_action="drop",
    )
    assert mm.shape == (tests[3], len(tests[2]))
    assert list(mm.model_spec.column_names) == tests[2]


def test_bs_out_of_range_raises_at_rematerialization():
    """Re-materializing bs() on out-of-sample values fails loudly
    (the formulaic/patsy contract), never silently clamps."""
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"x": rng.random(100)})
    X = tm.from_formula("bs(x, 4) - 1", df)
    spec = X.model_spec
    # in-range re-materialization works
    df2 = pd.DataFrame({"x": rng.random(20)})
    spec.get_model_matrix(df2)
    # out-of-range raises
    df3 = pd.DataFrame({"x": np.array([0.5, 10.0])})
    with pytest.raises(ValueError, match="outside the training range"):
        spec.get_model_matrix(df3)


def test_three_factor_basis_interaction_names():
    """poly():a:b keeps formulaic-style names (regression: names were
    re-wrapped as name[label] at the second interaction)."""
    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {"x": rng.random(50), "a": rng.random(50), "b": rng.random(50)}
    )
    X = tm.from_formula("poly(x, 2, raw=True):a:b - 1", df)
    assert X.column_names == [
        "poly(x, 2, raw=True)[1]:a:b",
        "poly(x, 2, raw=True)[2]:a:b",
    ]
    ref = np.column_stack(
        [df.x * df.a * df.b, df.x**2 * df.a * df.b]
    )
    np.testing.assert_allclose(X.toarray(), ref, rtol=1e-12)


def test_basis_categorical_interaction():
    """poly(x, k):c spreads into per-basis-column categorical interactions
    (formulaic parity; was NotImplementedError)."""
    rng = np.random.default_rng(3)
    n = 200
    df = pd.DataFrame(
        {"x": rng.random(n), "c": pd.Categorical(rng.choice(list("abc"), n))}
    )
    X = tm.from_formula("poly(x, 2, raw=True):c - 1", df)
    assert X.column_names == [
        "poly(x, 2, raw=True)[1]:c[a]",
        "poly(x, 2, raw=True)[1]:c[b]",
        "poly(x, 2, raw=True)[1]:c[c]",
        "poly(x, 2, raw=True)[2]:c[a]",
        "poly(x, 2, raw=True)[2]:c[b]",
        "poly(x, 2, raw=True)[2]:c[c]",
    ]
    onehot = pd.get_dummies(df.c).values.astype(float)
    ref = np.column_stack(
        [df.x ** (i + 1) * onehot[:, j] for i in range(2) for j in range(3)]
    )
    np.testing.assert_allclose(X.toarray(), ref, rtol=1e-12)
    # stateful re-materialization keeps levels and names
    df2 = pd.DataFrame(
        {"x": rng.random(40), "c": pd.Categorical(rng.choice(list("ab"), 40))}
    )
    X2 = X.model_spec.get_model_matrix(df2)
    assert X2.column_names == X.column_names
    # full product with full-rank reduction under an explicit intercept
    X3 = tm.from_formula("1 + poly(x, 2, raw=True)*c", df, ensure_full_rank=True)
    assert X3.shape[1] == 1 + 2 + 2 + 4  # intercept + poly + c-reduced + inter


@pytest.mark.parametrize("input", INPUTS)
def test_center_scale_transforms(input):
    # stateful location/spread transforms (formulaic's center/scale)
    df = _make_df(input)
    X = tm.from_formula("center(num_1) + scale(num_1) + scale(num_1, ddof=0)", df)
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    A = X.toarray()
    np.testing.assert_allclose(A[:, 0], x - x.mean(), atol=1e-12)
    np.testing.assert_allclose(A[:, 1], (x - x.mean()) / x.std(ddof=1), atol=1e-12)
    np.testing.assert_allclose(A[:, 2], (x - x.mean()) / x.std(ddof=0), atol=1e-12)
    assert X.column_names == [
        "center(num_1)", "scale(num_1)", "scale(num_1, ddof=0)",
    ]


def test_center_scale_stateful_rematerialization():
    df = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 5.0]})
    X = tm.from_formula("center(x) + scale(x)", df)
    x = df["x"].to_numpy()
    new = pd.DataFrame({"x": [10.0, -4.0]})
    A2 = X.model_spec.get_model_matrix(new).toarray()
    x2 = new["x"].to_numpy()
    # training statistics must be reused, not recomputed
    np.testing.assert_allclose(A2[:, 0], x2 - x.mean(), atol=1e-12)
    np.testing.assert_allclose(A2[:, 1], (x2 - x.mean()) / x.std(ddof=1), atol=1e-12)


def test_center_interaction_and_expr():
    df = pd.DataFrame({
        "x": [1.0, 2.0, 3.0, 4.0],
        "c": pd.Categorical(["a", "b", "a", "b"]),
    })
    X = tm.from_formula("center(x):c", df)
    x = df["x"].to_numpy()
    cx = x - x.mean()
    A = X.toarray()
    np.testing.assert_allclose(A[:, 0], cx * (df["c"] == "a"), atol=1e-12)
    np.testing.assert_allclose(A[:, 1], cx * (df["c"] == "b"), atol=1e-12)
