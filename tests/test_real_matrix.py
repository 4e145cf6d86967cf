"""End-to-end 12-decimal fp64 parity on a realistic mixed dataframe.

Mirrors the reference's ``test_real_matrix.py`` protocol (from_df →
standardize → sandwich must match the dense oracle to 12 decimals) on a
synthetic insurance-like dataset.
"""

import numpy as np
import pandas as pd

import tabmat_tpu as tm


def make_realistic_df(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "age": rng.integers(18, 90, n).astype(float),
            "bmi": rng.normal(27, 5, n),
            "claims": np.where(rng.random(n) < 0.08, rng.exponential(3, n), 0.0),
            "region": pd.Categorical(rng.choice(["N", "S", "E", "W"], n)),
            "vehicle": pd.Categorical(
                rng.choice([f"v{i}" for i in range(40)], n)
            ),
            "smoker": rng.random(n) < 0.2,
        }
    )


def test_standardized_sandwich_12_decimals():
    df = make_realistic_df()
    X = tm.from_df(df, cat_threshold=4)
    n = X.shape[0]
    weights = np.full(n, 1.0 / n)
    std, means, stds = X.standardize(weights, True, True)

    # scale d so sandwich entries are O(1): 12-decimal absolute tolerance
    # then corresponds to ~1e-12 relative error, the reference's bar
    # (reference tests/test_real_matrix.py:22 compares two tabmat paths)
    d = np.random.default_rng(1).random(n) / n
    result = std.sandwich(d)

    dense_oracle = tm.DenseMatrix(std.toarray())
    expected = dense_oracle.sandwich(d)
    np.testing.assert_almost_equal(result, expected, decimal=12)


def test_glm_hessian_workflow():
    df = make_realistic_df(2000, seed=2)
    X = tm.from_df(df, cat_threshold=4, drop_first=True)
    rng = np.random.default_rng(3)
    beta = rng.standard_normal(X.shape[1]) * 0.01
    eta = np.asarray(X.matvec(beta))
    mu = np.exp(eta)
    H = X.sandwich(mu)
    arr = X.toarray()
    ref = (arr * mu[:, None]).T @ arr
    np.testing.assert_allclose(H, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())
    grad = np.asarray(X.transpose_matvec(mu))
    np.testing.assert_allclose(grad, arr.T @ mu, rtol=1e-11)
