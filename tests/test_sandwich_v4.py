"""v4 anti-diagonal int8 sandwich + cache-tmv: exact-f64 parity.

The Pallas kernel runs in interpret mode on CPU; ``tmv_from_cache`` is
pure XLA (no Pallas) so it runs natively everywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tabmat_tpu  # noqa: F401  (x64 on)
from tabmat_tpu.ops import pallas_sandwich_v4 as v4


def _rand(n, k, seed, col_scales=True, d_scales=True):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, k))
    if col_scales:
        X = X * np.exp2(rng.uniform(-8, 8, size=(1, k)))
    d = rng.random(n)
    if d_scales:
        d = d * np.exp2(rng.uniform(-4, 4, size=n))
    return X, d


@pytest.mark.parametrize("n,k", [(5000, 50), (3001, 7), (4096, 128), (999, 3)])
def test_sandwich_interpret(n, k):
    X, d = _rand(n, k, seed=n + k)
    cache = v4.build_plane_cache(jnp.asarray(X))
    S = v4._sandwich_v4_jit(
        cache.xsh, cache.xsl, cache.bstk, cache.exps, jnp.asarray(d),
        cache.n, cache.k, cache.G, interpret=True,
    )
    ref = (X * d[:, None]).T @ X
    relerr = np.abs(np.asarray(S) - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13


@pytest.mark.parametrize("n,k", [(5000, 50), (3001, 7), (4096, 128), (999, 3)])
def test_tmv_from_cache(n, k):
    X, _ = _rand(n, k, seed=2 * n + k)
    rng = np.random.default_rng(7)
    r = rng.standard_normal(n) * np.exp2(rng.uniform(-4, 4, size=n))
    cache = v4.build_plane_cache(jnp.asarray(X))
    got = np.asarray(v4.tmv_from_cache(cache, jnp.asarray(r)))
    ref = X.T @ r
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13


def test_tmv_zero_column_and_signs():
    rng = np.random.default_rng(0)
    n = 2500
    X = rng.standard_normal((n, 5))
    X[:, 2] = 0.0
    X[:, 3] = -np.abs(X[:, 3])
    r = rng.standard_normal(n)
    r[::3] = 0.0
    cache = v4.build_plane_cache(jnp.asarray(X))
    got = np.asarray(v4.tmv_from_cache(cache, jnp.asarray(r)))
    np.testing.assert_allclose(got, X.T @ r, rtol=1e-13, atol=1e-13)


def test_tmv_long_mantissa():
    # values with all 53 mantissa bits set exercise the 48-bit pair limit
    rng = np.random.default_rng(1)
    n = 4000
    X = np.nextafter(rng.standard_normal((n, 9)), np.inf)
    r = np.nextafter(rng.standard_normal(n), -np.inf)
    cache = v4.build_plane_cache(jnp.asarray(X))
    got = np.asarray(v4.tmv_from_cache(cache, jnp.asarray(r)))
    ref = X.T @ r
    relerr = np.abs(got - ref).max() / np.abs(np.abs(X.T) @ np.abs(r)).max()
    assert relerr < 1e-13


def test_tmv_row_multiple_cache():
    # a shard-ready cache (extra zero pad rows) gives identical results
    X, _ = _rand(3000, 11, seed=5)
    r = np.random.default_rng(6).standard_normal(3000)
    c1 = v4.build_plane_cache(jnp.asarray(X))
    c2 = v4.build_plane_cache(jnp.asarray(X), row_multiple=v4.SUB * 4)
    g1 = np.asarray(v4.tmv_from_cache(c1, jnp.asarray(r)))
    g2 = np.asarray(v4.tmv_from_cache(c2, jnp.asarray(r)))
    np.testing.assert_allclose(g1, g2, rtol=0, atol=0)
    np.testing.assert_allclose(g1, X.T @ r, rtol=1e-12, atol=1e-12)


def test_class_route_uses_v4_tmv(monkeypatch):
    """DenseMatrix.transpose_matvec rides the v4 cache when present."""
    from tabmat_tpu.models.dense import DenseMatrix

    X, _ = _rand(3000, 13, seed=9)
    r = np.random.default_rng(10).standard_normal(3000)
    m = DenseMatrix(X)
    # force-eligible on CPU: pretend the plane cache is built
    m._plane_cache = v4.build_plane_cache(m._array)
    monkeypatch.setattr(
        DenseMatrix, "_get_plane_cache", lambda self: self._plane_cache
    )
    got = m.transpose_matvec(r)
    np.testing.assert_allclose(np.asarray(got), X.T @ r, rtol=1e-12, atol=1e-12)
    # row restriction still applies (mask folds into the vector)
    rows = np.arange(0, 3000, 2)
    got_r = m.transpose_matvec(r, rows=rows)
    np.testing.assert_allclose(
        np.asarray(got_r), X[rows].T @ r[rows], rtol=1e-12, atol=1e-12
    )
