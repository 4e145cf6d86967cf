"""Dataframe / sparse-matrix ingestion: ``from_df``, ``from_pandas``, ``from_csc``.

Parity target: reference ``tabmat/constructor.py:29-302`` and
``constructor_util.py:11-49``.  Ingestion is host-side column routing:
categorical dtypes become CategoricalMatrix (or one-hot split parts when
below ``cat_threshold``), numeric/boolean columns are routed dense vs sparse
by observed density, and everything is assembled into a SplitMatrix whose
device mirrors are built lazily on first use.
"""

import warnings
from typing import Union

import numpy as np
from scipy import sparse as sps

try:
    import narwhals.stable.v2 as nw
except ImportError:  # pragma: no cover
    nw = None

try:
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

from .models.base import MatrixBase
from .models.categorical import CategoricalMatrix
from .models.dense import DenseMatrix
from .models.sparse import SparseMatrix
from .models.split import SplitMatrix


def _split_sparse_and_dense_parts(
    arg1: sps.csc_matrix,
    threshold: float = 0.1,
    column_names=None,
    term_names=None,
) -> tuple[DenseMatrix, SparseMatrix, np.ndarray, np.ndarray]:
    """Split a CSC matrix into dense and sparse column groups by density."""
    if not isinstance(arg1, sps.csc_matrix):
        raise TypeError(
            "X must be of type scipy.sparse.csc_matrix or matrix.SparseMatrix,"
            f"not {type(arg1)}"
        )
    if not 0 <= threshold <= 1:
        raise ValueError("Threshold must be between 0 and 1.")
    densities = np.diff(arg1.indptr) / arg1.shape[0]
    dense_indices = np.where(densities > threshold)[0]
    sparse_indices = np.setdiff1d(np.arange(densities.shape[0]), dense_indices)

    if column_names is None:
        column_names = [None] * arg1.shape[1]
    if term_names is None:
        term_names = column_names

    X_dense = DenseMatrix(
        arg1[:, dense_indices].toarray(),
        column_names=[column_names[i] for i in dense_indices],
        term_names=[term_names[i] for i in dense_indices],
    )
    X_sparse = SparseMatrix(
        arg1[:, sparse_indices],
        column_names=[column_names[i] for i in sparse_indices],
        term_names=[term_names[i] for i in sparse_indices],
    )
    return X_dense, X_sparse, dense_indices, sparse_indices


def _reindex_cat(indices, cat_groups, mxcolidx):
    """Shift categorical index blocks to the end of the column space.

    Entries sharing a group id (the dense+sparse parts of one split-up
    categorical) carry indices into a COMMON within-category space and must
    receive the same offset; the offset advances by the group's total width.
    """
    new_indices = []
    group_offsets = {}
    group_sizes = {}
    for mat_indices, gid in zip(indices, cat_groups):
        if gid is not None:
            group_sizes[gid] = group_sizes.get(gid, 0) + len(mat_indices)
    for mat_indices, gid in zip(indices, cat_groups):
        if gid is not None:
            if gid not in group_offsets:
                group_offsets[gid] = mxcolidx
                mxcolidx += group_sizes[gid]
            new_indices.append(np.asarray(mat_indices) + group_offsets[gid])
        else:
            new_indices.append(mat_indices)
    return new_indices


def from_df(
    df,
    dtype=np.float64,
    sparse_threshold: float = 0.1,
    cat_threshold: int = 4,
    object_as_cat: bool = False,
    cat_position: str = "expand",
    drop_first: bool = False,
    categorical_format: str = "{name}[{category}]",
    cat_missing_method: str = "fail",
    cat_missing_name: str = "(MISSING)",
) -> MatrixBase:
    """Convert a dataframe (pandas, or anything narwhals supports) to a SplitMatrix.

    Column routing matches the reference: categorical dtype →
    CategoricalMatrix (one-hot split parts when the column has fewer than
    ``cat_threshold`` levels); numeric/boolean → dense if density >
    ``sparse_threshold`` else sparse; other dtypes are warned about and
    skipped.  ``cat_position`` 'expand' keeps original order, 'end' moves
    categorical columns to the end.
    """
    if nw is None:
        raise ImportError("from_df requires narwhals (or pandas).")
    df = nw.from_native(df, eager_only=True)

    matrices: list[Union[DenseMatrix, SparseMatrix, CategoricalMatrix]] = []
    indices: list[np.ndarray] = []
    cat_groups: list = []  # group id for categorical entries, else None
    next_group = 0

    dense_dfidx = []
    dense_tmidx = []
    sparse_dfidx = []
    sparse_tmidx = []
    ignored_cols = []

    mxcolidx = 0

    for dfcolidx, colname in enumerate(df.columns):
        coldata = df[:, dfcolidx]
        if object_as_cat:
            is_str = isinstance(coldata.dtype, (nw.String, nw.Object))
            if not is_str and pd is not None:
                is_str = isinstance(nw.to_native(coldata).dtype, pd.StringDtype)
            if is_str:
                coldata = coldata.cast(nw.Categorical)

        # pandas sparse dtype is invisible to narwhals; special-case it
        if pd is not None and isinstance(nw.to_native(coldata).dtype, pd.SparseDtype):
            sparse_dfidx.append(dfcolidx)
            sparse_tmidx.append(mxcolidx)
            mxcolidx += 1
            continue

        if isinstance(coldata.dtype, (nw.Categorical, nw.Enum)):
            cat = CategoricalMatrix(
                coldata,
                drop_first=drop_first,
                dtype=dtype,
                column_name=colname,
                term_name=colname,
                column_name_format=categorical_format,
                cat_missing_method=cat_missing_method,
                cat_missing_name=cat_missing_name,
            )
            if len(cat.categories) < cat_threshold:
                (
                    X_dense,
                    X_sparse,
                    dense_idx,
                    sparse_idx,
                ) = _split_sparse_and_dense_parts(
                    sps.csc_matrix(cat.tocsr(), dtype=dtype),
                    threshold=sparse_threshold,
                    column_names=cat.get_names("column"),
                    term_names=cat.get_names("term"),
                )
                matrices.append(X_dense)
                cat_groups.append(next_group)
                matrices.append(X_sparse)
                cat_groups.append(next_group)
                next_group += 1
                if cat_position == "expand":
                    indices.append(mxcolidx + dense_idx)
                    indices.append(mxcolidx + sparse_idx)
                    mxcolidx += len(dense_idx) + len(sparse_idx)
                elif cat_position == "end":
                    indices.append(dense_idx)
                    indices.append(sparse_idx)
            else:
                matrices.append(cat)
                cat_groups.append(next_group)
                next_group += 1
                if cat_position == "expand":
                    indices.append(mxcolidx + np.arange(cat.shape[1]))
                    mxcolidx += cat.shape[1]
                elif cat_position == "end":
                    indices.append(np.arange(cat.shape[1]))
        elif isinstance(coldata.dtype, nw.Boolean):
            if (coldata != False).mean() <= sparse_threshold:  # noqa: E712
                sparse_dfidx.append(dfcolidx)
                sparse_tmidx.append(mxcolidx)
            else:
                dense_dfidx.append(dfcolidx)
                dense_tmidx.append(mxcolidx)
            mxcolidx += 1
        elif coldata.dtype.is_numeric():
            if (coldata != 0).mean() <= sparse_threshold:
                sparse_dfidx.append(dfcolidx)
                sparse_tmidx.append(mxcolidx)
            else:
                dense_dfidx.append(dfcolidx)
                dense_tmidx.append(mxcolidx)
            mxcolidx += 1
        else:
            ignored_cols.append(colname)

    if len(ignored_cols) > 0:
        warnings.warn(
            f"Columns {ignored_cols} were ignored. Make sure they have a valid dtype."
        )
    if dense_dfidx:
        matrices.append(
            DenseMatrix(
                df[:, dense_dfidx].to_numpy().astype(dtype, copy=False),
                column_names=np.asarray(df.columns)[dense_dfidx],
                term_names=np.asarray(df.columns)[dense_dfidx],
            )
        )
        indices.append(np.asarray(dense_tmidx))
        cat_groups.append(None)
    if sparse_dfidx:
        native = nw.to_native(df)
        if pd is not None and isinstance(native, pd.DataFrame):
            sparse_cols = native.iloc[:, sparse_dfidx]
        else:
            sparse_cols = df[:, sparse_dfidx].to_numpy()
        matrices.append(
            SparseMatrix(
                sps.coo_matrix(sparse_cols, dtype=dtype),
                dtype=dtype,
                column_names=np.asarray(df.columns)[sparse_dfidx],
                term_names=np.asarray(df.columns)[sparse_dfidx],
            )
        )
        indices.append(np.asarray(sparse_tmidx))
        cat_groups.append(None)

    if cat_position == "end":
        indices = _reindex_cat(indices, cat_groups, mxcolidx)

    if len(matrices) > 1:
        return SplitMatrix(matrices, indices)
    elif len(matrices) == 0:
        raise ValueError("DataFrame contained no valid column")
    else:
        return matrices[0]


def from_pandas(
    df,
    dtype=np.float64,
    sparse_threshold: float = 0.1,
    cat_threshold: int = 4,
    object_as_cat: bool = False,
    cat_position: str = "expand",
    drop_first: bool = False,
    categorical_format: str = "{name}[{category}]",
    cat_missing_method: str = "fail",
    cat_missing_name: str = "(MISSING)",
) -> MatrixBase:
    """Deprecated alias of :func:`from_df` for pandas inputs."""
    return from_df(
        df,
        dtype=dtype,
        sparse_threshold=sparse_threshold,
        cat_threshold=cat_threshold,
        object_as_cat=object_as_cat,
        cat_position=cat_position,
        drop_first=drop_first,
        categorical_format=categorical_format,
        cat_missing_method=cat_missing_method,
        cat_missing_name=cat_missing_name,
    )


def from_csc(mat: sps.csc_matrix, threshold=0.1, column_names=None, term_names=None):
    """Convert a CSC matrix to a SplitMatrix with density-based routing."""
    dense, sparse, dense_idx, sparse_idx = _split_sparse_and_dense_parts(
        mat, threshold, column_names=column_names, term_names=term_names
    )
    return SplitMatrix([dense, sparse], [dense_idx, sparse_idx])
