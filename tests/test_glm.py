"""GLM solver tests: coefficient recovery against closed forms."""

import numpy as np
import pytest

import tabmat_tpu as tm
from tabmat_tpu.glm import fit_glm


def test_gaussian_matches_ols():
    rng = np.random.default_rng(0)
    n, k = 500, 8
    X = rng.standard_normal((n, k))
    beta_true = rng.standard_normal(k)
    y = X @ beta_true + 0.1 * rng.standard_normal(n)
    beta, n_iter = fit_glm(X, y, family="gaussian", n_cg=50)
    ols = np.linalg.solve(X.T @ X, X.T @ y)
    np.testing.assert_allclose(np.asarray(beta), ols, atol=1e-8)


def test_weighted_gaussian():
    rng = np.random.default_rng(1)
    n, k = 300, 5
    X = rng.standard_normal((n, k))
    y = X @ rng.standard_normal(k) + rng.standard_normal(n)
    w = rng.random(n) + 0.1
    beta, _ = fit_glm(X, y, sample_weight=w, family="gaussian", n_cg=50)
    ref = np.linalg.solve((X * w[:, None]).T @ X, X.T @ (w * y))
    np.testing.assert_allclose(np.asarray(beta), ref, atol=1e-8)


def test_poisson_recovers_coefficients():
    rng = np.random.default_rng(2)
    n, k = 2000, 4
    X = rng.standard_normal((n, k)) * 0.5
    beta_true = np.array([0.5, -0.3, 0.2, 0.1])
    y = rng.poisson(np.exp(X @ beta_true)).astype(np.float64)
    beta, n_iter = fit_glm(X, y, family="poisson", max_iter=50, n_cg=30)
    np.testing.assert_allclose(np.asarray(beta), beta_true, atol=0.1)


def test_logistic_recovers_coefficients():
    rng = np.random.default_rng(3)
    n, k = 5000, 3
    X = rng.standard_normal((n, k))
    beta_true = np.array([1.0, -0.5, 0.25])
    p = 1 / (1 + np.exp(-X @ beta_true))
    y = (rng.random(n) < p).astype(np.float64)
    beta, _ = fit_glm(X, y, family="logistic", max_iter=50, n_cg=30)
    np.testing.assert_allclose(np.asarray(beta), beta_true, atol=0.15)


def test_accepts_dense_matrix():
    rng = np.random.default_rng(4)
    X = tm.DenseMatrix(rng.standard_normal((100, 3)))
    y = rng.standard_normal(100)
    beta, _ = fit_glm(X, y, family="gaussian", n_cg=30)
    assert beta.shape == (3,)


def test_unknown_family_raises():
    with pytest.raises(ValueError, match="Unknown family"):
        fit_glm(np.ones((4, 1)), np.ones(4), family="bogus")
