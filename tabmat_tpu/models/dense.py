"""DenseMatrix: a device-resident dense matrix with the MatrixBase API.

Parity target: reference ``tabmat/dense_matrix.py:24-347``.  Instead of
wrapping a contiguous numpy array and dispatching to C++ kernels, this class
owns a ``jax.Array`` in HBM and dispatches to the jitted/Pallas kernels in
``tabmat_tpu.ops.dense_ops``.  Contiguity is irrelevant on device, so any
numpy layout is accepted without copies or warnings.
"""

import textwrap
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dense_ops
from ..utils import (
    _check_indexer,
    add_into_out,
    check_matvec_dimensions,
    check_matvec_out_shape,
    check_sandwich_compatible,
    check_transpose_matvec_out_shape,
    cols_to_mask,
    is_jax_array,
    result_like,
    rows_to_mask,
    set_up_rows_or_cols,
)
from ..utils.validation import is_identity_index
from .base import MatrixBase


class DenseMatrix(MatrixBase):
    """A dense matrix stored in device HBM.

    Supports the full MatrixBase contract: ``sandwich`` (MXU),
    ``matvec``/``transpose_matvec`` with active-set restriction, column
    standardization statistics, names, and indexing.

    Examples
    --------
    >>> import numpy as np, tabmat_tpu as tm
    >>> X = tm.DenseMatrix(np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
    >>> X.shape
    (3, 2)
    >>> np.asarray(X.matvec(np.array([1.0, 10.0])))
    array([21., 43., 65.])
    >>> np.asarray(X.sandwich(np.array([1.0, 1.0, 1.0])))
    array([[35., 44.],
           [44., 56.]])
    """

    def __init__(self, input_array, column_names=None, term_names=None):
        if isinstance(input_array, (jax.Array,)):
            arr = input_array
        else:
            arr = jnp.asarray(np.asarray(input_array))

        if arr.ndim == 1:
            arr = arr.reshape(-1, 1)
        elif arr.ndim > 2:
            raise ValueError("Input array must be 1- or 2-dimensional")

        self._array = arr
        self._ozaki_cache = None  # lazily-built X-side slice caches (TPU f64)
        self._ozaki_cache_T = None
        width = arr.shape[1]

        if column_names is not None:
            if len(column_names) != width:
                raise ValueError(
                    f"Expected {width} column names, got {len(column_names)}"
                )
            self._colnames = list(column_names)
        else:
            self._colnames = [None] * width

        if term_names is not None:
            if len(term_names) != width:
                raise ValueError(f"Expected {width} term names, got {len(term_names)}")
            self._terms = list(term_names)
        else:
            self._terms = self._colnames

    # -- array protocol ------------------------------------------------

    __array_ufunc__ = None

    @property
    def shape(self):
        """(n_rows, n_cols)."""
        return tuple(self._array.shape)

    @property
    def ndim(self):
        """Always 2 after construction."""
        return self._array.ndim

    @property
    def dtype(self):
        """Element dtype (numpy dtype object)."""
        return np.dtype(self._array.dtype)

    def transpose(self):
        """Transposed copy as a DenseMatrix."""
        return type(self)(self._array.T)

    T = property(transpose)

    def __matmul__(self, other):
        return result_like(other, self._array @ jnp.asarray(other))

    def __rmatmul__(self, other):
        return result_like(other, jnp.asarray(other) @ self._array)

    def __str__(self):
        return "{}x{} DenseMatrix:\n\n".format(*self.shape) + np.array_str(
            np.asarray(self._array)
        )

    def __repr__(self):
        class_name = type(self).__name__
        array_str = f"{class_name}({np.array2string(np.asarray(self._array), separator=', ')})"
        return textwrap.indent(
            array_str,
            " " * (len(class_name) + 1),
            predicate=lambda line: not line.startswith(class_name),
        )

    def __getitem__(self, key):
        row, col = _check_indexer(key)
        colnames = np.array(self.column_names, dtype=object)[col].ravel().tolist()
        terms = np.array(self.term_names, dtype=object)[col].ravel().tolist()

        # Stay on device for the common one-axis cases (gathers); fall back
        # to host numpy for full fancy (row, col) meshes.
        full = slice(None, None, None)
        if isinstance(row, slice) and row == full and isinstance(col, np.ndarray):
            sub = jnp.take(self._array, jnp.asarray(col.astype(np.int32)), axis=1)
        elif isinstance(col, slice) and col == full and isinstance(row, np.ndarray):
            sub = jnp.take(self._array, jnp.asarray(row.astype(np.int64)), axis=0)
        elif isinstance(row, slice) and isinstance(col, slice):
            sub = self._array[row, col]
        else:
            sub = np.asarray(self._array)[row, col]
        return type(self)(sub, column_names=colnames, term_names=terms)

    def getcol(self, i):
        """Column ``i`` as a (n, 1) DenseMatrix."""
        return type(self)(
            self._array[:, [i]],
            column_names=[self.column_names[i]],
            term_names=[self.term_names[i]],
        )

    def toarray(self) -> np.ndarray:
        """Host numpy copy."""
        return np.asarray(self._array)

    def unpack(self):
        """The underlying ``jax.Array``."""
        return self._array

    def astype(self, dtype, order="K", casting="unsafe", copy=True):
        """Cast to ``dtype`` (order/casting accepted for API parity)."""
        return type(self)(
            self._array.astype(dtype),
            column_names=self.column_names,
            term_names=self.term_names,
        )

    def multiply(self, other):
        """Row-wise (1-d ``other``) or elementwise (2-d) scaling."""
        other_arr = jnp.asarray(np.asarray(other))
        if other_arr.ndim == 1:
            other_arr = other_arr[:, None]
        return type(self)(
            self._array * other_arr,
            column_names=self.column_names,
            term_names=self.term_names,
        )

    # -- core ops --------------------------------------------------------

    def sandwich(
        self,
        d,
        rows: Optional[np.ndarray] = None,
        cols: Optional[np.ndarray] = None,
    ):
        """``X[rows, cols].T @ diag(d[rows]) @ X[rows, cols]``."""
        d_in = d
        d = jnp.asarray(np.asarray(d) if not is_jax_array(d) else d)
        check_sandwich_compatible(self, d)

        mask = rows_to_mask(
            None if rows is None else np.asarray(rows), self.shape[0], self.dtype
        )
        cols_np = None
        if not is_identity_index(cols, self.shape[1]):
            cols_np = np.asarray(cols)

        plane_cache = self._get_plane_cache() if cols_np is None else None
        S, k = dense_ops.sandwich_restricted(
            self._array,
            d,
            None if mask is None else jnp.asarray(mask),
            cols_np,
            ozaki_cache=(
                self._get_ozaki_cache()
                if cols_np is None and plane_cache is None
                else None
            ),
            plane_cache=plane_cache,
        )
        if is_jax_array(d_in):
            return S[:k, :k] if S.shape[0] != k else S
        out = np.asarray(S)
        return out[:k, :k] if out.shape[0] != k else out

    # X-side Ozaki slices are structural: build once, reuse every sandwich.
    # Budget: 7 bf16 slices ≈ 0.9× the f64 matrix itself in HBM per layout
    # (the sandwich uses the chunked (S, nc, CHUNK, k) layout, the matvec
    # the transposed (S, k, n) layout — see ozaki.slice_matrix_T).
    _OZAKI_CACHE_MAX_ELEMENTS = 1 << 26

    def _ozaki_eligible(self) -> bool:
        from ..ops.ozaki import cache_worthwhile

        n, k = self.shape
        return cache_worthwhile(n, k, self.dtype, self._OZAKI_CACHE_MAX_ELEMENTS)

    def _get_ozaki_cache(self):
        if not self._ozaki_eligible():
            return None
        if self._ozaki_cache is None:
            from .._config import cache_charge
            from ..ops import ozaki

            n, k = self.shape
            if not cache_charge(14 * n * k, self):  # 7 bf16 slices
                return None
            self._ozaki_cache = ozaki.slice_matrix(self._array)
        return self._ozaki_cache

    def _get_plane_cache(self):
        """Structural f32-plane cache for the one-pass v3 sandwich kernel.

        Half the HBM of the 7-slice bf16 cache (8 vs 14 bytes/element) and
        the kernel never re-slices the d side in HBM — see
        ``ops/pallas_sandwich_v3``.
        """
        from ..ops import pallas_sandwich_v3, pallas_sandwich_v5

        pref = pallas_sandwich_v5.preferred()  # v4 or v5 by config
        n, k = self.shape
        if not self._ozaki_eligible():
            return None
        if getattr(self, "_plane_cache", None) is None:
            from .._config import cache_charge

            est = (
                pref.estimate_cache_bytes(n, k)
                if pref.supported(n, k, self.dtype)
                else pallas_sandwich_v3.estimate_cache_bytes(n, k)
            )
            if not cache_charge(est, self):
                return None
            # v4/v5 (int8 plane stacks, B side precomputed) when the
            # packed width fits one lane tile; else the v3 self-slicer
            if pref.supported(n, k, self.dtype):
                self._plane_cache = pref.build_plane_cache(self._array)
            elif pallas_sandwich_v3.supported(n, k, self.dtype):
                # narrow matrices pack G row-groups into the lanes
                if pallas_sandwich_v3.pack_group(k) > 1:
                    self._plane_cache = (
                        pallas_sandwich_v3.build_plane_cache_packed(self._array)
                    )
                else:
                    self._plane_cache = pallas_sandwich_v3.build_plane_cache(
                        self._array
                    )
            else:
                return None
        return self._plane_cache

    def _get_ozaki_cache_T(self):
        """Transposed slice cache used by the exact-f64 matvec."""
        if not self._ozaki_eligible():
            return None
        if getattr(self, "_ozaki_cache_T", None) is None:
            from .._config import cache_charge
            from ..ops import ozaki

            n, k = self.shape
            if not cache_charge(14 * n * k, self):
                return None
            self._ozaki_cache_T = ozaki.slice_matrix_T(self._array)
        return self._ozaki_cache_T

    def __getstate__(self):
        """Pickle without the rebuildable slice caches."""
        state = self.__dict__.copy()
        state["_ozaki_cache"] = None
        state["_ozaki_cache_T"] = None
        state["_plane_cache"] = None
        return state

    def _cross_sandwich(
        self,
        other,
        d,
        rows: Optional[np.ndarray] = None,
        L_cols: Optional[np.ndarray] = None,
        R_cols: Optional[np.ndarray] = None,
    ):
        """Cross-sandwich ``X[:, L_cols].T @ diag(d) @ other[:, R_cols]``."""
        from .categorical import CategoricalMatrix
        from .sparse import SparseMatrix

        if isinstance(other, (SparseMatrix, CategoricalMatrix)):
            return other._cross_sandwich(self, d, rows, R_cols, L_cols).T
        raise TypeError

    def _get_col_stds(self, weights, col_means) -> np.ndarray:
        """Weighted column standard deviations (shifted, robust form)."""
        sqrt_arg = np.array(
            dense_ops.transpose_square_dot_weights(
                self._array,
                jnp.asarray(np.asarray(weights), dtype=self.dtype),
                jnp.asarray(np.asarray(col_means), dtype=self.dtype),
            )
        )
        # tiny negative values can appear from floating point error
        sqrt_arg[sqrt_arg < 0] = 0
        return np.sqrt(sqrt_arg)

    def _matvec_helper(self, vec, rows, cols, out, transpose: bool):
        vec_in = vec
        vec = jnp.asarray(np.asarray(vec) if not is_jax_array(vec) else vec)
        check_matvec_dimensions(self, vec, transpose=transpose)

        n, k = self.shape
        unrestricted_rows = rows is None or len(rows) == n
        # matvec sums over the cols SET (order-free); transpose_matvec's
        # output is ORDERED by cols, so it needs the identity check
        unrestricted_cols = (
            is_identity_index(cols, k) if transpose
            else cols is None or len(cols) == k
        )

        if transpose:
            v_eff = vec
            if not unrestricted_rows:
                mask = rows_to_mask(np.asarray(rows), n, vec.dtype)
                m = jnp.asarray(mask)
                v_eff = vec * (m if vec.ndim == 1 else m[:, None])
            res_full = None
            if v_eff.ndim == 1:
                from ..ops import pallas_sandwich_v4, pallas_sandwich_v5

                # ride the v4/v5 sandwich cache only when it already
                # exists (GLM loops always sandwich too); a tmv-only
                # caller gets the cheaper ozaki transpose cache instead
                # of eagerly paying the full plane-stack HBM build
                pc = getattr(self, "_plane_cache", None)
                if isinstance(
                    pc,
                    (
                        pallas_sandwich_v4.PlaneCacheV4,
                        pallas_sandwich_v5.PlaneCacheV5,
                    ),
                ):
                    # one batched int8 dot over the sandwich cache's
                    # B-stack — reads the only O(n·k) operand once and
                    # shares HBM with the sandwich (no second slice cache)
                    res_full = pallas_sandwich_v5.module_for(pc).tmv_from_cache(
                        pc, v_eff
                    )
                else:
                    cache = self._get_ozaki_cache()
                    if cache is not None:
                        from ..ops import ozaki

                        res_full = ozaki.transpose_matvec_cached(
                            cache[0], cache[1], v_eff
                        )
            if res_full is None:
                res_full = dense_ops.transpose_matvec(self._array, v_eff)
            if unrestricted_cols:
                res = res_full
                if out is None:
                    return result_like(vec_in, res)
                return add_into_out(out, res)
            cols_np = set_up_rows_or_cols(cols, k)
            if out is None:
                return result_like(vec_in, jnp.take(res_full, jnp.asarray(cols_np), axis=0))
            if isinstance(out, np.ndarray):
                out[cols_np] += np.asarray(
                    jnp.take(res_full, jnp.asarray(cols_np), axis=0), dtype=out.dtype
                )
                return out
            # jax out: add the full-length masked contribution
            cmask = jnp.asarray(cols_to_mask(cols_np, k, np.dtype(res_full.dtype)))
            scaled = res_full * (cmask if res_full.ndim == 1 else cmask[:, None])
            return out + scaled.astype(out.dtype)
        else:
            # matvec: only column restriction is supported by the contract;
            # it is equivalent to zeroing the unselected entries of vec.
            v_eff = vec
            if not unrestricted_cols:
                cmask = jnp.asarray(
                    cols_to_mask(np.asarray(cols), k, np.dtype(vec.dtype))
                )
                v_eff = vec * (cmask if vec.ndim == 1 else cmask[:, None])
            cache_T = self._get_ozaki_cache_T() if v_eff.ndim == 1 else None
            if cache_T is not None:
                # exact-f64 matvec on the MXU via transposed bf16 slices:
                # ~1.5 ms at 1M×50 vs ~90 ms for the emulated-f64 dot
                from ..ops import ozaki

                res = ozaki.matvec_cached_T(
                    cache_T[0], cache_T[1], v_eff, n=self.shape[0]
                )
            else:
                res = dense_ops.matvec(self._array, v_eff)
            if out is None:
                return result_like(vec_in, res)
            return add_into_out(out, res)

    def matvec(self, vec, cols: Optional[np.ndarray] = None, out=None):
        """``X[:, cols] @ vec[cols]``."""
        check_matvec_out_shape(self, out)
        return self._matvec_helper(vec, None, cols, out, False)

    def transpose_matvec(
        self,
        vec,
        rows: Optional[np.ndarray] = None,
        cols: Optional[np.ndarray] = None,
        out=None,
    ):
        """``X[rows, cols].T @ vec[rows]``."""
        check_transpose_matvec_out_shape(self, out)
        return self._matvec_helper(vec, rows, cols, out, True)

    # -- names -----------------------------------------------------------

    def get_names(
        self,
        type: str = "column",
        missing_prefix: Optional[str] = None,
        indices: Optional[list[int]] = None,
    ) -> list[Optional[str]]:
        """Column/term names with optional default-name generation."""
        if type == "column":
            names = np.array(self._colnames, dtype=object)
        elif type == "term":
            names = np.array(self._terms, dtype=object)
        else:
            raise ValueError(f"Type must be 'column' or 'term', got {type}")

        if indices is None:
            indices = list(range(len(self._colnames)))
        if missing_prefix is not None:
            defaults = np.array(
                [f"{missing_prefix}{i}" for i in indices], dtype=object
            )
            missing = np.array([nm is None for nm in names.tolist()])
            names[missing] = defaults[missing]
        return names.tolist()

    def set_names(self, names, type: str = "column"):
        """Set column/term names (must match the column count)."""
        if isinstance(names, str):
            names = [names]
        if len(names) != self.shape[1]:
            raise ValueError(f"Length of names must be {self.shape[1]}")
        if type == "column":
            self._colnames = list(names)
        elif type == "term":
            self._terms = list(names)
        else:
            raise ValueError(f"Type must be 'column' or 'term', got {type}")
