"""Native host-helper tests (counting argsort, is_sorted, combine_codes)."""

import numpy as np
import pytest

from tabmat_tpu import _native


def test_counting_argsort_matches_numpy():
    rng = np.random.default_rng(0)
    keys = rng.integers(-1, 50, 10_000).astype(np.int32)
    perm, bounds = _native.counting_argsort(keys, 50)
    ref_perm = np.argsort(keys, kind="stable")
    ref_bounds = np.searchsorted(keys[ref_perm], np.arange(51))
    np.testing.assert_array_equal(perm, ref_perm)
    np.testing.assert_array_equal(bounds, ref_bounds)


def test_counting_argsort_empty():
    perm, bounds = _native.counting_argsort(np.array([], dtype=np.int32), 5)
    assert len(perm) == 0
    np.testing.assert_array_equal(bounds, np.zeros(6, dtype=np.int32))


def test_is_sorted():
    assert _native.is_sorted(np.array([1, 2, 2, 3]))
    assert not _native.is_sorted(np.array([1, 0]))
    assert _native.is_sorted(np.array([], dtype=np.int64))


def test_combine_codes():
    a = np.array([0, 1, -1, 2], dtype=np.int32)
    b = np.array([1, -1, 0, 2], dtype=np.int32)
    out = _native.combine_codes(a, b, 3)
    np.testing.assert_array_equal(out, [1, -1, -1, 8])
