"""Interpret-mode battery for the one-pass self-slicing dense sandwich.

The v3 kernel (ops/pallas_sandwich_v3) is the TPU fast path for the
cached exact-f64 dense sandwich — counterpart of the reference's fused
dense sandwich (tabmat/ext/dense_helpers-tmpl.cpp:41-143).  These tests
run the Pallas kernel in interpret mode on CPU; the hardware twin lives
in tests/test_tpu_kernels.py.

Accuracy metric: error scaled by sqrt(S_ii·S_jj) (the natural column
scale).  Elementwise relative error is not meaningful for entries that
are cancellation-small relative to their column scales — plain f64
accumulation has the same property.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tabmat_tpu.ops import pallas_sandwich_v3 as v3  # noqa: E402


def _scaled_err(out, ref):
    diag = np.sqrt(np.abs(np.diag(ref)) + 1e-300)
    return (np.abs(out - ref) / (diag[:, None] * diag[None, :])).max()


def _run(X, d):
    cache = v3.build_plane_cache(jnp.asarray(X, jnp.float64))
    out = v3.sandwich_v3(
        cache.xsh, cache.xsl, cache.exps, jnp.asarray(d), interpret=True
    )
    return np.asarray(out)


@pytest.mark.parametrize(
    "n,k",
    [(v3.BT, 4), (2 * v3.BT + 384, 7), (v3.BT + 128, 50)],
)
def test_random(n, k):
    rng = np.random.default_rng(n + k)
    X = rng.standard_normal((n, k)) * np.exp(rng.uniform(-8, 8, (1, k)))
    d = rng.uniform(0.1, 10.0, n) * np.exp(rng.uniform(-4, 4, n))
    assert _scaled_err(_run(X, d), (X.T * d) @ X) < 1e-13


def test_max_k():
    rng = np.random.default_rng(0)
    n, k = v3.BT, v3.MAX_K
    X = rng.standard_normal((n, k))
    d = rng.uniform(0.5, 2.0, n)
    assert _scaled_err(_run(X, d), (X.T * d) @ X) < 1e-13


def test_long_mantissa_d():
    # regression: the in-kernel one-hot-dot transpose ran the MXU at
    # default (bf16-input) precision and mangled d to 8 mantissa bits
    rng = np.random.default_rng(1)
    n, k = v3.BT, 5
    X = rng.standard_normal((n, k))
    d = rng.uniform(0.5, 1.0, n)
    assert _scaled_err(_run(X, d), (X.T * d) @ X) < 1e-13


def test_zero_and_negative_d():
    rng = np.random.default_rng(2)
    n, k = v3.BT, 6
    X = rng.standard_normal((n, k))
    d = rng.standard_normal(n)
    d[::3] = 0.0
    # signed d cancels in the true diagonal; scale by the |d| mass instead
    ref = (X.T * d) @ X
    diag = np.sqrt(np.diag((X.T * np.abs(d)) @ X))
    err = (np.abs(_run(X, d) - ref) / (diag[:, None] * diag[None, :])).max()
    assert err < 1e-13


def test_zero_column():
    rng = np.random.default_rng(3)
    n, k = v3.BT, 4
    X = rng.standard_normal((n, k))
    X[:, 2] = 0.0
    d = rng.uniform(0.5, 2.0, n)
    out = _run(X, d)
    assert np.all(out[2, :] == 0) and np.all(out[:, 2] == 0)
    assert _scaled_err(out[np.ix_([0, 1, 3], [0, 1, 3])],
                       ((X.T * d) @ X)[np.ix_([0, 1, 3], [0, 1, 3])]) < 1e-13


def test_extreme_scales():
    rng = np.random.default_rng(4)
    n, k = v3.BT, 4
    X = rng.standard_normal((n, k))
    X[:, 0] *= 1e100
    X[:, 1] *= 1e-100
    d = rng.uniform(0.5, 2.0, n) * 1e50
    assert _scaled_err(_run(X, d), (X.T * d) @ X) < 1e-13


def _run_packed(X, d):
    cache = v3.build_plane_cache_packed(jnp.asarray(X, jnp.float64))
    return np.asarray(v3.sandwich_v3_packed(cache, jnp.asarray(d), interpret=True))


@pytest.mark.parametrize("n,k", [(2048, 3), (5000, 1), (3000, 10), (2048, 33)])
def test_packed_narrow(n, k):
    # lane-packing: G = MAX_K // k row-groups side by side; diagonal
    # blocks of the packed result sum to the true sandwich
    rng = np.random.default_rng(n * k)
    X = rng.standard_normal((n, k)) * np.exp(rng.uniform(-6, 6, (1, k)))
    d = rng.uniform(0.1, 10.0, n) * np.exp(rng.uniform(-3, 3, n))
    assert v3.pack_group(k) > 1
    assert _scaled_err(_run_packed(X, d), (X.T * d) @ X) < 1e-13


def test_packed_matches_plain():
    rng = np.random.default_rng(7)
    n, k = 2 * v3.BT, 5
    X = rng.standard_normal((n, k))
    d = rng.uniform(0.5, 2.0, n)
    assert np.allclose(
        _run_packed(X, d), _run(X, d), rtol=1e-13, atol=1e-13
    )


def test_huge_n_small_probe():
    # padding across several grid steps
    rng = np.random.default_rng(5)
    n, k = 3 * v3.BT + 777, 3
    X = rng.standard_normal((n, k))
    d = rng.uniform(0.1, 1.0, n)
    assert _scaled_err(_run(X, d), (X.T * d) @ X) < 1e-13
