"""Pallas kernel parity tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tabmat_tpu.ops.pallas_kernels import dense_sandwich_f32


@pytest.mark.parametrize("n,k", [(100, 3), (1024, 128), (2050, 50), (513, 200)])
def test_dense_sandwich_f32_interpret(n, k):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, k)).astype(np.float32)
    d = rng.random(n).astype(np.float32)
    ref = (X * d[:, None]).T @ X
    got = np.asarray(dense_sandwich_f32(jnp.asarray(X), jnp.asarray(d), interpret=True))
    # f32 tolerance: sqrt(eps) relative, as in the reference kernel tests
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_wide_fallback():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((256, 2000)).astype(np.float32)
    d = rng.random(256).astype(np.float32)
    ref = (X * d[:, None]).T @ X
    got = np.asarray(dense_sandwich_f32(jnp.asarray(X), jnp.asarray(d)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
