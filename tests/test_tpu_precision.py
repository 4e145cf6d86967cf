"""TPU float64 precision contract (documents measured platform behavior).

Measured on the target backend (TPU v5e via the axon PJRT plugin):

- storage/roundtrip and VPU reductions (sum/cumsum/elementwise) are
  correctly-rounded float64 at any size;
- ``dot_general`` with f64 operands is exact up to ~4096 contraction
  length, then degrades to ~2e-8 relative error (the emulation switches
  algorithm);
- Pallas rejects f64 refs entirely.

tabmat-tpu therefore chunks every long f64 contraction at 4096 rows with
f64 inter-chunk accumulation (``ops.dense_ops._F64_CHUNK``).  These tests
assert the *library-level* guarantee that follows: 1e-12 relative error on
dense sandwich/tmv regardless of n.  They run on whatever backend the
session uses (CPU in CI, TPU on hardware).
"""

import numpy as np
import jax.numpy as jnp

from tabmat_tpu.ops import dense_ops


def test_sandwich_exact_at_large_n():
    rng = np.random.default_rng(0)
    n, k = 50_000, 20
    X_np = rng.standard_normal((n, k))
    d_np = rng.random(n)
    S = np.asarray(dense_ops.sandwich(jnp.asarray(X_np), jnp.asarray(d_np)))
    ref = (X_np * d_np[:, None]).T @ X_np
    relerr = np.abs(S - ref).max() / np.abs(ref).max()
    assert relerr < 1e-12, relerr


def test_chunked_sandwich_matches_unchunked():
    rng = np.random.default_rng(1)
    n, k = 10_000, 7
    X = jnp.asarray(rng.standard_normal((n, k)))
    d = jnp.asarray(rng.random(n))
    S1 = np.asarray(dense_ops._sandwich_f64_chunked(X, d))
    S2 = np.asarray(dense_ops._sandwich_jnp(X, d))
    np.testing.assert_allclose(S1, S2, rtol=1e-13)


def test_tmv_exact_at_large_n():
    rng = np.random.default_rng(2)
    n, k = 50_000, 20
    X_np = rng.standard_normal((n, k))
    v_np = rng.standard_normal(n)
    out = np.asarray(
        dense_ops.transpose_matvec(jnp.asarray(X_np), jnp.asarray(v_np))
    )
    ref = X_np.T @ v_np
    relerr = np.abs(out - ref).max() / np.abs(ref).max()
    assert relerr < 1e-12, relerr


def test_chunked_tmv_2d():
    rng = np.random.default_rng(3)
    n, k, m = 9000, 5, 3
    X = jnp.asarray(rng.standard_normal((n, k)))
    V = jnp.asarray(rng.standard_normal((n, m)))
    out = np.asarray(dense_ops._transpose_matvec_f64_chunked(X, V))
    ref = np.asarray(X).T @ np.asarray(V)
    np.testing.assert_allclose(out, ref, rtol=1e-12)
