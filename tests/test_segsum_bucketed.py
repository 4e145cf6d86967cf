"""Bucketed MXU segment-sum kernel: interpreter-mode parity tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from tabmat_tpu.ops import pallas_segsum_bucketed as psb
from tabmat_tpu.ops.pallas_segsum import build_codes_col


@pytest.mark.parametrize(
    "n,W",
    [(5000, 3000), (20000, 100000), (4096, 1500), (2048, 1025), (100, 2000)],
)
def test_bucketed_matches_scatter_oracle(n, W):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, W, n).astype(np.int32)
    codes[rng.choice(n, max(n // 50, 1), replace=False)] = -1  # missing
    v = rng.standard_normal(n) * np.exp(rng.standard_normal(n) * 3)
    ref = np.zeros(W)
    np.add.at(ref, codes[codes >= 0], v[codes >= 0])
    ccol = jnp.asarray(build_codes_col(codes))
    got = np.asarray(
        psb.segsum_bucketed(jnp.asarray(v), ccol, W, interpret=True)
    )
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-300)
    assert err < 1e-13


def test_bucketed_f32():
    rng = np.random.default_rng(1)
    n, W = 30000, 50000
    codes = rng.integers(0, W, n).astype(np.int32)
    v = rng.standard_normal(n).astype(np.float32)
    ref = np.zeros(W)
    np.add.at(ref, codes, v.astype(np.float64))
    got = np.asarray(
        psb.segsum_bucketed(
            jnp.asarray(v), jnp.asarray(build_codes_col(codes)), W,
            interpret=True,
        )
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


def test_empty_segments_and_all_missing_tile():
    # a whole tile of -1 sentinels plus many never-hit segments
    rng = np.random.default_rng(2)
    n, W = 6000, 4096
    codes = np.full(n, -1, dtype=np.int32)
    codes[:2000] = rng.integers(0, 17, 2000)  # only first segments hit
    v = rng.standard_normal(n)
    ref = np.zeros(W)
    np.add.at(ref, codes[codes >= 0], v[codes >= 0])
    got = np.asarray(
        psb.segsum_bucketed(
            jnp.asarray(v), jnp.asarray(build_codes_col(codes)), W,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-12)
