"""Mosaic int8 grid-accumulate sandwich: interpreter-mode parity.

CPU numerics twin of ``ops/pallas_int8_sandwich.py`` (the env-gated
TPU route inside ``sparse_wide._sym_sandwich``): the kernel's 12-pair
int32 accumulation + exact f32-pair flush must reproduce the plain
per-pair integer contractions bit-for-bit at the platform's ~48-bit
window.  Tests run tiny tile sizes — the interpreter walks the grid
serially on one host core; the kernel body is tile-size agnostic.
"""

import numpy as np

import jax.numpy as jnp

from tabmat_tpu.ops import pallas_int8_sandwich as pi8
from tabmat_tpu.ops.sparse_wide import SYM_PAIRS, T_BITS

TI = TJ = 128  # lane-width minimum
TK = 32  # int8 sublane tile


def _reference(P):
    """Σ over SYM_PAIRS of the weighted symmetric integer products."""
    S = np.zeros((P.shape[2], P.shape[2]))
    for p, q in SYM_PAIRS:
        part = P[p].astype(np.int64).T @ P[q].astype(np.int64)
        part = part.astype(np.float64)
        if p != q:
            part = part + part.T
        S += part * 0.5 ** ((p + q + 2) * T_BITS)
    return S


def _run(P, k=None):
    parts = pi8.int8_pair_sandwich(
        jnp.asarray(P, jnp.int8),
        tuple(SYM_PAIRS),
        ti=TI,
        tj=TJ,
        tk=TK,
        interpret=True,
    )
    return np.asarray(
        pi8.combine_symmetric(parts, k if k is not None else P.shape[2])
    )


def test_int8_sandwich_single_tile():
    rng = np.random.default_rng(0)
    P = rng.integers(-64, 65, size=(7, TK, TI), dtype=np.int8)
    got = _run(P)
    ref = _reference(P)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-14


def test_int8_sandwich_multi_tile_grid():
    # multiple row steps AND multiple output tiles exercise the scratch
    # init/flush per (i, j) and the revisit accumulation order
    rng = np.random.default_rng(1)
    P = rng.integers(-64, 65, size=(7, 3 * TK, 2 * TI), dtype=np.int8)
    got = _run(P)
    ref = _reference(P)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-14


def test_int8_sandwich_padded_shapes():
    # ragged logical shape zero-padded to the tile grid, result cropped
    rng = np.random.default_rng(2)
    n, k = 70, 150
    n_pad = -(-n // TK) * TK
    k_pad = -(-k // TI) * TI
    P = np.zeros((7, n_pad, k_pad), dtype=np.int8)
    P[:, :n, :k] = rng.integers(-64, 65, size=(7, n, k), dtype=np.int8)
    got = _run(P, k=k)
    ref = _reference(P[:, :, :k])
    assert got.shape == (k, k)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-14


def test_int8_sandwich_accumulator_magnitudes():
    # alternating-sign saturated planes drive the int32 accumulators and
    # the hi/lo flush split through their sign/magnitude corners
    P = np.full((7, 2 * TK, TI), 64, dtype=np.int8)
    P[:, ::2, :] = -64
    got = _run(P)
    ref = _reference(P)
    assert np.abs(got - ref).max() <= np.abs(ref).max() * 1e-14 + 1e-9
