"""Diagonal sandwich results.

A categorical sandwich is diagonal (one-hot columns are orthogonal:
reference ``tabmat/categorical_matrix.py:109-121``).  The reference returns
``scipy.sparse.dia_matrix``; tabmat-tpu returns this lightweight wrapper so
the diagonal can stay on device, with ``to_scipy()`` for interop.
"""

from typing import Union

import jax
import numpy as np


class DiagonalResult:
    """A (k, k) diagonal matrix represented by its diagonal vector."""

    def __init__(self, diag: Union[jax.Array, np.ndarray]):
        self.diag = diag
        self.shape = (diag.shape[0], diag.shape[0])

    @property
    def dtype(self):
        return self.diag.dtype

    def toarray(self) -> np.ndarray:
        """Densify to a host numpy array."""
        return np.diag(np.asarray(self.diag))

    @property
    def data(self) -> np.ndarray:
        """Diagonal data in scipy ``dia_matrix.data`` layout: shape (1, k)."""
        return np.asarray(self.diag)[None, :]

    def to_scipy(self):
        """Convert to ``scipy.sparse.dia_matrix``."""
        from scipy import sparse as sps

        return sps.diags(np.asarray(self.diag))

    def __repr__(self):
        return f"DiagonalResult(k={self.shape[0]}, dtype={self.dtype})"
