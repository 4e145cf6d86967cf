"""Ozaki exact-f64 bf16-MXU contraction tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from tabmat_tpu.ops import ozaki


@pytest.mark.parametrize("n,k", [(1000, 5), (20_000, 40), (4097, 1)])
def test_sandwich_exact(n, k):
    rng = np.random.default_rng(0)
    X_np = rng.standard_normal((n, k)) * np.exp(rng.standard_normal((1, k)) * 3)
    d_np = rng.random(n)
    ref = (X_np * d_np[:, None]).T @ X_np
    got = np.asarray(ozaki.sandwich(jnp.asarray(X_np), jnp.asarray(d_np)))
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13, relerr


def test_sandwich_dynamic_range():
    rng = np.random.default_rng(1)
    X_np = rng.standard_normal((5000, 4))
    X_np[::100] *= 1e8
    d_np = rng.random(5000)
    ref = (X_np * d_np[:, None]).T @ X_np
    got = np.asarray(ozaki.sandwich(jnp.asarray(X_np), jnp.asarray(d_np)))
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13, relerr


def test_sandwich_with_zero_columns():
    rng = np.random.default_rng(2)
    X_np = rng.standard_normal((300, 3))
    X_np[:, 1] = 0.0
    d_np = rng.random(300)
    ref = (X_np * d_np[:, None]).T @ X_np
    got = np.asarray(ozaki.sandwich(jnp.asarray(X_np), jnp.asarray(d_np)))
    np.testing.assert_allclose(got, ref, atol=1e-13)


def test_sandwich_negative_d():
    rng = np.random.default_rng(3)
    X_np = rng.standard_normal((2000, 6))
    d_np = rng.standard_normal(2000)  # signed weights
    ref = (X_np * d_np[:, None]).T @ X_np
    got = np.asarray(ozaki.sandwich(jnp.asarray(X_np), jnp.asarray(d_np)))
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13, relerr


@pytest.mark.parametrize("n,k", [(1000, 5), (20_000, 40)])
def test_transpose_matvec_exact(n, k):
    rng = np.random.default_rng(4)
    X_np = rng.standard_normal((n, k))
    v_np = rng.standard_normal(n)
    ref = X_np.T @ v_np
    got = np.asarray(ozaki.transpose_matvec(jnp.asarray(X_np), jnp.asarray(v_np)))
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13, relerr


def test_cached_matvec_tmv():
    from tabmat_tpu.ops.ozaki import (
        matvec_cached_T,
        slice_matrix,
        slice_matrix_T,
        transpose_matvec_cached,
    )

    rng = np.random.default_rng(5)
    n, k = 5000, 30
    X_np = rng.standard_normal((n, k)) * np.exp(rng.standard_normal((1, k)) * 2)
    v_np = rng.standard_normal(k) * np.exp(rng.standard_normal(k))
    r_np = rng.standard_normal(n)

    cache_T = slice_matrix_T(jnp.asarray(X_np))
    mv = np.asarray(matvec_cached_T(cache_T[0], cache_T[1], jnp.asarray(v_np), n=n))
    ref = X_np @ v_np
    assert np.abs(mv - ref).max() / np.abs(ref).max() < 1e-13

    cache = slice_matrix(jnp.asarray(X_np))
    tmv = np.asarray(transpose_matvec_cached(cache[0], cache[1], jnp.asarray(r_np)))
    ref = X_np.T @ r_np
    assert np.abs(tmv - ref).max() / np.abs(ref).max() < 1e-13


def test_cached_matvec_T_padded_n():
    """n not a multiple of anything special; slices carry full n."""
    from tabmat_tpu.ops.ozaki import matvec_cached_T, slice_matrix_T

    rng = np.random.default_rng(6)
    n, k = 4097, 7
    X_np = rng.standard_normal((n, k))
    X_np[:, 2] = 0.0
    cache_T = slice_matrix_T(jnp.asarray(X_np))
    v_np = rng.standard_normal(k)
    mv = np.asarray(matvec_cached_T(cache_T[0], cache_T[1], jnp.asarray(v_np), n=n))
    ref = X_np @ v_np
    assert np.abs(mv - ref).max() / max(np.abs(ref).max(), 1e-300) < 1e-13


def test_matvec_cached_T_exact_beyond_k256():
    """k > 256 contractions must chunk: the f32 slice-product accumulator
    is exact only to k = 2^(24-2T) = 256 (regression: wide-but-eligible
    designs silently lost ~1e-5 of accuracy before chunking)."""
    rng = np.random.default_rng(5)
    n, k = 2048, 512
    # adversarial: values near the column max keep the leading slice large
    X = rng.uniform(0.5, 1.0, (n, k)) * rng.choice([-1.0, 1.0], (n, k))
    v = rng.uniform(0.5, 1.0, k) * rng.choice([-1.0, 1.0], k)
    QXT, eXT = ozaki.slice_matrix_T(jnp.asarray(X))
    got = np.asarray(ozaki.matvec_cached_T(QXT, eXT, jnp.asarray(v)))
    ref = X @ v
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    assert relerr < 1e-13, relerr


def test_f32plane_vector_slicing_edges():
    """Reconstruction at 49-bit coverage across dynamic ranges and zeros."""
    import jax.numpy as jnp

    from tabmat_tpu.ops import ozaki

    rng = np.random.default_rng(5)
    cases = [
        rng.standard_normal(10000) * np.exp(rng.standard_normal(10000) * 4),
        np.zeros(100),
        np.concatenate([np.zeros(50), np.full(50, 1e300), np.full(50, -1e-300)]),
        np.array([1.0]),
    ]
    for v in cases:
        q, exp = ozaki.slice_vector_f32planes(jnp.asarray(v))
        qn = np.asarray(q, dtype=np.float64)
        assert np.abs(qn).max() <= 256  # bf16-exact integer range
        recon = sum(
            qn[p] * 0.5 ** ((p + 1) * ozaki.T7) for p in range(qn.shape[0])
        ) * float(exp)
        scale = max(np.abs(v).max(), 1e-300)
        assert np.abs(recon - v).max() / scale < 2**-47.5


def test_f32plane_matrix_slicing_per_column_scales():
    import jax.numpy as jnp

    from tabmat_tpu.ops import ozaki

    rng = np.random.default_rng(6)
    A = rng.standard_normal((500, 4)) * np.array([1e-8, 1.0, 1e8, 1e80])
    q, exps = ozaki.slice_matrix_f32planes(jnp.asarray(A))
    qn = np.asarray(q, dtype=np.float64)
    recon = sum(
        qn[p] * 0.5 ** ((p + 1) * ozaki.T7) for p in range(qn.shape[0])
    ) * np.asarray(exps)[None, :]
    col_scale = np.abs(A).max(axis=0)
    assert (np.abs(recon - A).max(axis=0) / col_scale < 2**-47.5).all()
