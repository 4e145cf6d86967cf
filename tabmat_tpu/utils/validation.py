"""Host-side argument validation and rows/cols restriction canonicalization.

Mirrors the eager-validation layer of the reference (``tabmat/util.py:6-116``):
shape checks raise ``ValueError``/``TypeError`` before any device work, and
``rows``/``cols`` active-set arguments are normalized to int32 index arrays.

TPU twist: restrictions are *kept on the host* as numpy arrays.  Downstream,
row restrictions are turned into 0/1 multiplicative masks (exact for every
op, since all three core ops are linear row-reductions) and column
restrictions are applied via gathers on the small column axis — both avoid
dynamic shapes inside jitted code.
"""

from typing import Optional

import numpy as np


def set_up_rows_or_cols(arr, length: int, dtype=np.int32) -> np.ndarray:
    """Normalize an optional index array to a concrete int index array."""
    if arr is None:
        return np.arange(length, dtype=dtype)
    return np.asarray(arr).astype(dtype)


def setup_restrictions(
    shape: tuple[int, int],
    rows,
    cols,
    dtype=np.int32,
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize both active-set restrictions as index arrays."""
    return (
        set_up_rows_or_cols(rows, shape[0], dtype),
        set_up_rows_or_cols(cols, shape[1], dtype),
    )


def _check_out_shape(out, expected_first_dim: int) -> None:
    if out is not None and out.shape[0] != expected_first_dim:
        raise ValueError(
            f"The first dimension of 'out' must be {expected_first_dim}, "
            f"but it is {out.shape[0]}."
        )


def check_transpose_matvec_out_shape(mat, out) -> None:
    """Check that ``out`` of a transpose_matvec conforms to the column count."""
    _check_out_shape(out, mat.shape[1])


def check_matvec_out_shape(mat, out) -> None:
    """Check that ``out`` of a matvec conforms to the row count."""
    _check_out_shape(out, mat.shape[0])


def check_matvec_dimensions(mat, vec, transpose: bool) -> None:
    """Check vector/matrix alignment for (transpose_)matvec."""
    match_dim = 0 if transpose else 1
    if mat.shape[match_dim] != vec.shape[0]:
        raise ValueError(
            f"shapes {mat.shape} and {vec.shape} not aligned: "
            f"{mat.shape[match_dim]} (dim {match_dim}) != {vec.shape[0]} (dim 0)"
        )


def check_sandwich_compatible(mat, d) -> None:
    """Check shape and dtype compatibility for the sandwich product."""
    if mat.shape[0] != d.shape[0]:
        raise ValueError(
            f"shapes {mat.shape} and {d.shape} not aligned: "
            f"{mat.shape[0]} (dim 0) != {d.shape[0]} (dim 0)"
        )
    if np.dtype(mat.dtype) != np.dtype(d.dtype):
        raise TypeError(
            "self and d need to be of same dtype, either np.float64 or "
            f"np.float32. self is of type {mat.dtype}, while d is of type "
            f"{d.dtype}."
        )


def _check_indexer(indexer):
    """Validate a ``__getitem__`` key and return a canonical (row, col) pair.

    Canonical forms match the reference contract (``tabmat/util.py:70-116``):
    slices pass through; 1-d array-likes are flattened; a pair of arrays is
    turned into an ``np.ix_``-style open mesh; ``np.ix_``-ed inputs are
    accepted as-is; anything higher-dimensional raises.
    """
    if not isinstance(indexer, tuple):
        indexer = (indexer, slice(None, None, None))

    if len(indexer) > 2:
        raise ValueError("More than two indexers are not supported.")

    row_indexer, col_indexer = indexer

    if isinstance(row_indexer, slice):
        if isinstance(col_indexer, slice):
            return row_indexer, col_indexer
        col_indexer = np.asarray(col_indexer)
        if col_indexer.ndim > 1:
            raise ValueError(
                "Indexing would result in a matrix with more than 2 dimensions."
            )
        return row_indexer, col_indexer.reshape(-1)

    if isinstance(col_indexer, slice):
        row_indexer = np.asarray(row_indexer)
        if row_indexer.ndim > 1:
            raise ValueError(
                "Indexing would result in a matrix with more than 2 dimensions."
            )
        return row_indexer.reshape(-1), col_indexer

    row_indexer = np.asarray(row_indexer)
    col_indexer = np.asarray(col_indexer)
    if row_indexer.ndim <= 1 and col_indexer.ndim <= 1:
        return np.ix_(row_indexer.reshape(-1), col_indexer.reshape(-1))
    if (
        row_indexer.ndim == 2
        and row_indexer.shape[1] == 1
        and col_indexer.ndim == 2
        and col_indexer.shape[0] == 1
    ):
        # np.ix_-style pre-meshed indices
        return row_indexer, col_indexer
    raise ValueError("This type of indexing is not supported.")


def is_full_length(indexer: Optional[np.ndarray], length: int) -> bool:
    """True when a rows/cols restriction covers the whole axis (or is None).

    Sufficient for ROW restrictions: every core op reduces over rows, so a
    full-length permutation is equivalent to no restriction (rows are
    assumed unique, as in the reference — ``tabmat/dense_matrix.py:208``).
    """
    return indexer is None or len(indexer) == length


def is_identity_index(indexer: Optional[np.ndarray], length: int) -> bool:
    """True when a COLUMN restriction is exactly the identity 0..length-1.

    Column restrictions order the output, so a permuted full-length array is
    NOT a no-op; order-sensitive call sites must use this stronger check.
    """
    if indexer is None:
        return True
    arr = np.asarray(indexer)
    if len(arr) != length or arr[0] != 0 or arr[-1] != length - 1:
        return False
    return bool(np.array_equal(arr, np.arange(length, dtype=arr.dtype)))
