"""SplitMatrix invariants + randomized property tests (mirrors reference)."""

import numpy as np
import pytest
from scipy import sparse as sps

import tabmat_tpu as tm


def test_combines_dense_blocks():
    rng = np.random.default_rng(0)
    d1 = tm.DenseMatrix(rng.standard_normal((10, 2)))
    d2 = tm.DenseMatrix(rng.standard_normal((10, 3)))
    X = tm.SplitMatrix([d1, d2])
    assert len(X.matrices) == 1
    assert isinstance(X.matrices[0], tm.DenseMatrix)
    assert X.matrices[0].shape == (10, 5)


def test_combines_sparse_blocks():
    s1 = tm.SparseMatrix(sps.random(10, 2, density=0.5, random_state=0))
    s2 = tm.SparseMatrix(sps.random(10, 3, density=0.5, random_state=1))
    X = tm.SplitMatrix([s1, s2])
    assert len(X.matrices) == 1
    assert isinstance(X.matrices[0], tm.SparseMatrix)


def test_combine_preserves_column_order():
    rng = np.random.default_rng(0)
    a1 = rng.standard_normal((6, 2))
    a2 = rng.standard_normal((6, 2))
    # interleaved global indices
    X = tm.SplitMatrix(
        [tm.DenseMatrix(a1), tm.DenseMatrix(a2)],
        [np.array([0, 2]), np.array([1, 3])],
    )
    expected = np.empty((6, 4))
    expected[:, [0, 2]] = a1
    expected[:, [1, 3]] = a2
    np.testing.assert_allclose(X.toarray(), expected, atol=1e-14)


def test_flattens_nested_splits():
    rng = np.random.default_rng(0)
    inner = tm.SplitMatrix(
        [tm.DenseMatrix(rng.standard_normal((5, 2))),
         tm.SparseMatrix(sps.random(5, 2, density=0.5, random_state=0))]
    )
    outer = tm.SplitMatrix([inner, tm.DenseMatrix(rng.standard_normal((5, 1)))])
    assert all(not isinstance(m, tm.SplitMatrix) for m in outer.matrices)
    assert outer.shape == (5, 5)


def test_bad_indices_raises():
    rng = np.random.default_rng(0)
    d = tm.DenseMatrix(rng.standard_normal((5, 2)))
    with pytest.raises(ValueError, match="all integers"):
        tm.SplitMatrix([d], [np.array([0, 2])])
    with pytest.raises(ValueError, match="sorted"):
        tm.SplitMatrix(
            [d, tm.DenseMatrix(rng.standard_normal((5, 1)))],
            [np.array([1, 0]), np.array([2])],
        )


def test_mismatched_rows_raises():
    with pytest.raises(ValueError, match="first dimension"):
        tm.SplitMatrix(
            [
                tm.DenseMatrix(np.ones((5, 1))),
                tm.DenseMatrix(np.ones((6, 1))),
            ]
        )


def test_split_col_subsets_property():
    rng = np.random.default_rng(0)
    X = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((8, 3))),
            tm.CategoricalMatrix(rng.integers(0, 4, 8), categories=np.arange(4)),
        ],
        [np.array([0, 2, 4]), np.array([1, 3, 5, 6])],
    )
    cols = np.array([1, 2, 5, 6], dtype=np.int32)
    subset_idx, subset_cols, n_cols = X._split_col_subsets(cols)
    assert n_cols == 4
    for i in range(len(X.indices)):
        np.testing.assert_array_equal(
            X.indices[i][subset_cols[i]], cols[subset_idx[i]]
        )


@pytest.mark.parametrize("seed", range(10))
def test_random_mixes_against_dense_oracle(seed):
    rng = np.random.default_rng(seed)
    n = rng.integers(20, 60)
    blocks = []
    n_blocks = rng.integers(2, 5)
    for _ in range(n_blocks):
        kind = rng.integers(0, 3)
        if kind == 0:
            blocks.append(tm.DenseMatrix(rng.standard_normal((n, rng.integers(1, 4)))))
        elif kind == 1:
            blocks.append(
                tm.SparseMatrix(
                    sps.random(n, rng.integers(1, 4), density=0.3,
                               random_state=int(seed))
                )
            )
        else:
            ncat = int(rng.integers(2, 5))
            blocks.append(
                tm.CategoricalMatrix(
                    rng.integers(0, ncat, n), categories=np.arange(ncat),
                    drop_first=bool(rng.integers(0, 2)),
                )
            )
    X = tm.SplitMatrix(blocks)
    arr = X.toarray()
    d = rng.random(n)
    v = rng.standard_normal(X.shape[1])
    vr = rng.standard_normal(n)
    np.testing.assert_allclose(
        X.sandwich(d), (arr * d[:, None]).T @ arr, atol=1e-11
    )
    np.testing.assert_allclose(np.asarray(X.matvec(v)), arr @ v, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(X.transpose_matvec(vr)), arr.T @ vr, atol=1e-11
    )
    # restricted
    rows = np.sort(rng.choice(n, size=n // 2, replace=False)).astype(np.int32)
    cols = np.sort(
        rng.choice(X.shape[1], size=max(X.shape[1] // 2, 1), replace=False)
    ).astype(np.int32)
    sub = arr[np.ix_(rows, cols)]
    np.testing.assert_allclose(
        X.sandwich(d, rows, cols), (sub * d[rows][:, None]).T @ sub, atol=1e-11
    )


def test_hstack_mixed():
    rng = np.random.default_rng(0)
    X = tm.hstack(
        [
            rng.standard_normal((7, 2)),
            sps.random(7, 2, density=0.5, random_state=0),
        ]
    )
    assert isinstance(X, tm.SplitMatrix)
    assert X.shape == (7, 4)


def test_multiply():
    rng = np.random.default_rng(0)
    X = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((6, 2))),
            tm.CategoricalMatrix(rng.integers(0, 3, 6), categories=np.arange(3)),
        ]
    )
    w = rng.random(6)
    np.testing.assert_allclose(
        X.multiply(w).toarray(), X.toarray() * w[:, None], atol=1e-14
    )


def _mixed_split(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    return (
        tm.SplitMatrix(
            [
                tm.DenseMatrix(rng.standard_normal((n, 4))),
                tm.CategoricalMatrix(rng.integers(0, 23, n)),
                tm.CategoricalMatrix(rng.integers(0, 11, n), drop_first=True),
            ]
        ),
        rng,
    )


def test_sandwich_device_resident_matches_host():
    """jax-d sandwich stays on device and matches the host assembly."""
    import jax.numpy as jnp

    X, rng = _mixed_split()
    d = rng.random(X.shape[0])
    H_host = X.sandwich(d)
    H_dev = X.sandwich(jnp.asarray(d))
    assert hasattr(H_dev, "device")  # no silent download
    np.testing.assert_allclose(np.asarray(H_dev), H_host, atol=1e-11)


def test_sandwich_device_resident_restrictions():
    import jax.numpy as jnp

    X, rng = _mixed_split(seed=1)
    n = X.shape[0]
    d = rng.random(n)
    rows = rng.choice(n, n // 2, replace=False)
    cols = np.array([0, 2, 5, 9, 20], dtype=np.int32)
    H_host = X.sandwich(d, rows=rows, cols=cols)
    H_dev = X.sandwich(jnp.asarray(d), rows=rows, cols=cols)
    np.testing.assert_allclose(np.asarray(H_dev), H_host, atol=1e-11)


def test_sandwich_device_sparse_block_falls_back():
    """Sparse-containing splits keep the host assembly but stay correct."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    n = 1000
    X = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((n, 3))),
            tm.SparseMatrix(sps.random(n, 6, density=0.1, format="csc", random_state=0)),
            tm.CategoricalMatrix(rng.integers(0, 7, n)),
        ]
    )
    d = rng.random(n)
    np.testing.assert_allclose(
        np.asarray(X.sandwich(jnp.asarray(d))), X.sandwich(d), atol=1e-11
    )


def test_standardized_sandwich_device_resident():
    import jax.numpy as jnp

    X, rng = _mixed_split(seed=3)
    w = np.full(X.shape[0], 1.0 / X.shape[0])
    Xs, _, _ = X.standardize(w, True, True)
    d = rng.random(X.shape[0])
    H_host = Xs.sandwich(d)
    H_dev = Xs.sandwich(jnp.asarray(d))
    assert hasattr(H_dev, "device")
    np.testing.assert_allclose(np.asarray(H_dev), H_host, atol=1e-11)


def test_device_design_cache_dropped_on_pickle():
    import pickle

    import jax.numpy as jnp

    X, rng = _mixed_split(seed=4)
    d = rng.random(X.shape[0])
    H = np.asarray(X.sandwich(jnp.asarray(d)))
    X2 = pickle.loads(pickle.dumps(X))
    assert getattr(X2, "_device_design", None) is None
    np.testing.assert_allclose(np.asarray(X2.sandwich(jnp.asarray(d))), H, atol=1e-11)


def test_matvec_tmv_device_resident():
    """jax 1-d vectors route through the fused DeviceDesign program."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = 2000
    X = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((n, 3))),
            tm.SparseMatrix(
                sps.random(n, 6, density=0.1, format="csc", random_state=1)
            ),
            tm.CategoricalMatrix(rng.integers(0, 9, n)),
        ]
    )
    A = X.toarray()
    v = rng.standard_normal(X.shape[1])
    r = rng.standard_normal(n)
    mv = X.matvec(jnp.asarray(v))
    tv = X.transpose_matvec(jnp.asarray(r))
    assert hasattr(mv, "device") and hasattr(tv, "device")
    np.testing.assert_allclose(np.asarray(mv), A @ v, atol=1e-11)
    np.testing.assert_allclose(np.asarray(tv), A.T @ r, atol=1e-11)
    # restrictions match the host path
    cols = np.array([0, 2, 8])
    rows = rng.choice(n, n // 3, replace=False)
    np.testing.assert_allclose(
        np.asarray(X.matvec(jnp.asarray(v), cols=cols)),
        X.matvec(v, cols=cols),
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(X.transpose_matvec(jnp.asarray(r), rows=rows, cols=cols)),
        X.transpose_matvec(r, rows=rows, cols=cols),
        atol=1e-11,
    )
