"""Fused slice-pair contraction kernel: interpreter-mode parity."""

import numpy as np

import jax.numpy as jnp

from tabmat_tpu.ops import ozaki, pallas_pairs


def test_pair_contractions_exact():
    rng = np.random.default_rng(0)
    n, k = 1024, 50
    QA = np.clip(np.round(rng.standard_normal((7, n, k)) * 40), -128, 128)
    QB = np.clip(np.round(rng.standard_normal((7, n, k)) * 60), -200, 200)
    pairs = ozaki._mixed_pairs(7, 7)
    parts = np.asarray(
        pallas_pairs.pair_contractions(
            jnp.asarray(QA, jnp.bfloat16),
            jnp.asarray(QB, jnp.bfloat16),
            pairs,
            interpret=True,
        )
    )
    for idx, (p, q) in enumerate(pairs):
        ref = QA[p].T @ QB[q]
        got = parts[idx, 0].astype(np.float64) + parts[idx, 1].astype(
            np.float64
        )
        assert np.abs(got - ref).max() < 1e-6


def test_pair_contractions_padded_rows():
    rng = np.random.default_rng(1)
    n, k = 300, 7  # padded to a TILE multiple with zero rows
    n_pad = -(-n // pallas_pairs.TILE) * pallas_pairs.TILE
    QA = np.zeros((3, n_pad, k))
    QB = np.zeros((3, n_pad, k))
    QA[:, :n] = np.round(rng.standard_normal((3, n, k)) * 50)
    QB[:, :n] = np.round(rng.standard_normal((3, n, k)) * 50)
    pairs = ((0, 0), (1, 2), (2, 1))
    parts = np.asarray(
        pallas_pairs.pair_contractions(
            jnp.asarray(QA, jnp.bfloat16),
            jnp.asarray(QB, jnp.bfloat16),
            pairs,
            interpret=True,
        )
    )
    for idx, (p, q) in enumerate(pairs):
        ref = QA[p].T @ QB[q]
        got = parts[idx, 0].astype(np.float64) + parts[idx, 1].astype(
            np.float64
        )
        assert np.abs(got - ref).max() < 1e-6


def test_pair_contractions_sliced_interpret():
    """In-kernel A-side slicing matches the exact sandwich oracle."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    n, k = 512, 13
    X = rng.standard_normal((n, k)) * np.exp(rng.standard_normal((n, k)))
    d = rng.random(n)
    A = X * d[:, None]
    e = np.ceil(np.log2(np.abs(A).max(axis=0)))
    eA = np.exp2(e)
    scaled = A / eA
    yh = scaled.astype(np.float32)
    yl = (scaled - yh.astype(np.float64)).astype(np.float32)
    QB, eB = ozaki.slice_matrix(jnp.asarray(X))
    n_pad = QB.shape[1] * QB.shape[2]
    qb = jnp.reshape(QB, (QB.shape[0], n_pad, k))
    pad = [(0, n_pad - n), (0, 0)]
    pairs = ozaki._mixed_pairs(7, 7)
    parts = np.asarray(
        pallas_pairs.pair_contractions_sliced(
            jnp.asarray(np.pad(yh, pad)),
            jnp.asarray(np.pad(yl, pad)),
            qb,
            pairs,
            interpret=True,
        )
    )
    tot = parts[:, 0].astype(np.float64) + parts[:, 1].astype(np.float64)
    w = np.array(
        [0.5 ** (ozaki.T7 * (p + 1) + ozaki.T * (q + 1)) for p, q in pairs]
    )
    S = np.einsum("pij,p->ij", tot, w) * np.outer(eA, np.asarray(eB))
    ref = A.T @ X
    assert np.abs(S - ref).max() / np.abs(ref).max() < 5e-14
