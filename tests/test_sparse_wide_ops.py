"""CPU numerics for the wide-sparse int8-plane matvec / transpose-matvec.

The structural plane build and the i32 contractions are plain XLA (only
the sandwich's per-call slicing needs the Pallas gather), so exactness
is checkable on CPU.  Hardware timing lives in tests/test_tpu_kernels.py.
Counterpart of the reference CSR walkers (tabmat/ext/sparse.pyx:79-199).
"""

import numpy as np
import pytest
import scipy.sparse as sps

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import tabmat_tpu  # noqa: F401  (enables x64)
from tabmat_tpu.ops import sparse_wide  # noqa: E402


def _plan(n, k, density, seed=0):
    A = sps.random(
        n, k, density=density, format="csc", random_state=seed, dtype=np.float64
    )
    A.data = A.data * np.exp(
        np.random.default_rng(seed).uniform(-6, 6, A.nnz)
    )
    return A, sparse_wide.WideSandwichPlan(A)


@pytest.mark.parametrize("n,k", [(500, 700), (1000, 300)])
def test_wide_matvec_exact(n, k):
    A, plan = _plan(n, k, 0.02)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(k) * np.exp(rng.uniform(-4, 4, k))
    out = np.asarray(sparse_wide.wide_matvec(plan, jnp.asarray(v)))
    ref = A @ v
    # accuracy model: X planes are exact to 2^-49 of each COLUMN's max
    # (same model as the sandwich / ozaki slice caches), so row error is
    # bounded by the pattern-weighted column-scale mass — not by the
    # element mass, which can sit far below its column max
    colmax = np.abs(A).max(axis=0).toarray().ravel()
    pat = (A != 0).astype(float)
    colmass = pat @ (colmax * np.abs(v)) + 1e-300
    assert (np.abs(out - ref) / colmass).max() < 1e-13


@pytest.mark.parametrize("n,k", [(500, 700), (1000, 300)])
def test_wide_tmv_exact(n, k):
    A, plan = _plan(n, k, 0.02, seed=3)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(n) * np.exp(rng.uniform(-4, 4, n))
    out = np.asarray(sparse_wide.wide_transpose_matvec(plan, jnp.asarray(u)))
    ref = A.T @ u
    denom = np.maximum(np.abs(ref), (np.abs(A.T) @ np.abs(u)) * 1e-14 + 1e-300)
    assert (np.abs(out - ref) / denom).max() < 1e-1  # cancellation-scaled
    # normwise: tight
    nw = np.abs(out - ref).max() / (np.abs(A.T) @ np.abs(u) + 1e-300).max()
    assert nw < 1e-14


def test_wide_matvec_zero_vector():
    A, plan = _plan(300, 400, 0.03, seed=5)
    out = np.asarray(sparse_wide.wide_matvec(plan, jnp.zeros(400)))
    assert np.all(out == 0)


def test_struct_planes_reconstruct():
    # the int8 planes with per-column scales reconstruct X exactly
    A, plan = _plan(400, 200, 0.05, seed=7)
    planes, scale = sparse_wide._structural_planes(plan)
    X = np.zeros(A.shape)
    for p, P in enumerate(planes):
        X += np.asarray(P, dtype=np.float64) * 0.5 ** (
            (p + 1) * sparse_wide.T_BITS
        )
    X = X * np.asarray(scale)[None, :]
    assert np.abs(X - A.toarray()).max() < 1e-13 * np.abs(A).max()
