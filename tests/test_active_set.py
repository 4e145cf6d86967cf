"""Active-set (coordinate-descent) behavior: shrinking col sets stay exact.

The GLM solver shrinks the active column set across iterations; column
restriction uses power-of-two bucketed gathers to bound recompilation.
These tests sweep many set sizes to exercise every bucket path.
"""

import numpy as np
import pytest

import tabmat_tpu as tm
from tabmat_tpu.ops.dense_ops import bucket_size, pad_cols


def test_bucket_size():
    assert bucket_size(1) == 8
    assert bucket_size(8) == 8
    assert bucket_size(9) == 16
    assert bucket_size(100) == 128


def test_pad_cols_mask_exact():
    cols = np.array([3, 7, 1], dtype=np.int32)
    padded, mask, k = pad_cols(cols, bucket=True)
    assert k == 3
    assert len(padded) == 8
    np.testing.assert_array_equal(mask[:3], 1)
    np.testing.assert_array_equal(mask[3:], 0)


@pytest.mark.parametrize("size", [1, 2, 3, 5, 8, 13, 21, 30])
def test_shrinking_active_sets(size):
    rng = np.random.default_rng(size)
    n, k = 500, 30
    X = rng.standard_normal((n, k))
    mat = tm.DenseMatrix(X)
    d = rng.random(n)
    cols = np.sort(rng.choice(k, size=size, replace=False)).astype(np.int32)
    sub = X[:, cols]
    np.testing.assert_allclose(
        mat.sandwich(d, cols=cols), (sub * d[:, None]).T @ sub, atol=1e-12
    )
    v = rng.standard_normal(k)
    np.testing.assert_allclose(
        np.asarray(mat.matvec(v, cols=cols)), sub @ v[cols], atol=1e-12
    )
    r = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(mat.transpose_matvec(r, cols=cols)), sub.T @ r, atol=1e-12
    )


def test_split_active_set_workflow():
    """Simulated coordinate-descent pass over a mixed design."""
    rng = np.random.default_rng(0)
    n = 400
    mat = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((n, 4))),
            tm.CategoricalMatrix(rng.integers(0, 6, n), categories=np.arange(6)),
        ]
    )
    arr = mat.toarray()
    d = rng.random(n)
    active = np.arange(mat.shape[1])
    for it in range(4):
        # shrink the active set, as a solver would
        active = active[:: 2] if len(active) > 2 else active
        sub = arr[:, active]
        np.testing.assert_allclose(
            mat.sandwich(d, cols=active),
            (sub * d[:, None]).T @ sub,
            atol=1e-12,
        )
