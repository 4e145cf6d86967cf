"""Unit tests for validation/array utilities and DiagonalResult."""

import numpy as np
import pytest
from scipy import sparse as sps

import tabmat_tpu as tm
from tabmat_tpu.ops.diag import DiagonalResult
from tabmat_tpu.utils import (
    _check_indexer,
    add_into_out,
    rows_to_mask,
    set_up_rows_or_cols,
)


def test_set_up_rows_or_cols():
    np.testing.assert_array_equal(set_up_rows_or_cols(None, 4), [0, 1, 2, 3])
    np.testing.assert_array_equal(set_up_rows_or_cols([2, 0], 4), [2, 0])
    assert set_up_rows_or_cols(None, 4).dtype == np.int32


def test_rows_to_mask():
    assert rows_to_mask(None, 5, np.float64) is None
    assert rows_to_mask(np.arange(5), 5, np.float64) is None
    m = rows_to_mask(np.array([0, 3]), 5, np.float64)
    np.testing.assert_array_equal(m, [1, 0, 0, 1, 0])


def test_check_indexer_canonical_forms():
    r, c = _check_indexer((slice(None), [1, 2]))
    assert isinstance(r, slice)
    np.testing.assert_array_equal(c, [1, 2])

    r, c = _check_indexer([0, 1])
    np.testing.assert_array_equal(r, [0, 1])
    assert isinstance(c, slice)

    r, c = _check_indexer(([0, 1], [2, 3]))  # meshed
    assert r.shape == (2, 1) and c.shape == (1, 2)

    with pytest.raises(ValueError, match="More than two"):
        _check_indexer((0, 1, 2))
    with pytest.raises(ValueError, match="more than 2 dimensions"):
        _check_indexer((slice(None), np.zeros((2, 2))))


def test_add_into_out_numpy_inplace():
    import jax.numpy as jnp

    out = np.ones(3)
    res = add_into_out(out, jnp.asarray([1.0, 2.0, 3.0]))
    assert res is out
    np.testing.assert_array_equal(out, [2, 3, 4])


def test_diagonal_result_api():
    d = DiagonalResult(np.array([1.0, 2.0, 3.0]))
    assert d.shape == (3, 3)
    np.testing.assert_array_equal(d.toarray(), np.diag([1.0, 2.0, 3.0]))
    assert d.data.shape == (1, 3)
    scipy_mat = d.to_scipy()
    assert isinstance(scipy_mat, sps.dia_matrix)
    np.testing.assert_array_equal(scipy_mat.toarray(), d.toarray())
    assert "DiagonalResult" in repr(d)


def test_one_over_var_inf_to_val():
    from tabmat_tpu.models.base import one_over_var_inf_to_val

    arr = np.array([2.0, 0.0, 1e-9, -4.0])
    out = one_over_var_inf_to_val(arr, 1.0)
    np.testing.assert_allclose(out, [0.5, 1.0, 1.0, -0.25])
