"""Windowed monotone-take kernel: interpret-mode parity vs numpy take.

Covers the plan builder (monotonicity/span gating) and both dtype paths
of the kernel itself; the sparse-matrix routing that uses it is gated to
TPU and covered numerically by the driver bench.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tabmat_tpu.ops import pallas_window_take as wt


def _sorted_idx(rng, n, hi):
    return np.sort(rng.integers(0, hi, size=n)).astype(np.int64)


def _pair_representable(rng, n, dtype):
    """Values exactly representable as the platform's (hi, lo) f32 pair.

    On-CPU interpret runs must compare EXACTLY equal; true f64 carries
    53 mantissa bits while the TPU's f64 is an f32 pair (~48), so the
    test data is built from an explicit pair."""
    if dtype == np.float32:
        return rng.standard_normal(n).astype(np.float32) * np.exp(
            rng.uniform(-8, 8, size=n)
        ).astype(np.float32)
    hi = rng.standard_normal(n).astype(np.float32).astype(np.float64)
    lo = (rng.standard_normal(n).astype(np.float32) * 2.0**-30).astype(
        np.float64
    )
    return (hi + lo) * np.exp2(rng.integers(-8, 8, size=n))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize(
    "n,src_len",
    [
        (1000, 500),  # repeats, small table padded to the window height
        (40_000, 40_000),  # ~identity-scale monotone walk
        (70_000, 3_000),  # contracting map (indptr-like)
    ],
)
def test_window_take_matches_numpy(dtype, n, src_len):
    rng = np.random.default_rng(n + src_len)
    idx = _sorted_idx(rng, n, src_len)
    plan = wt.build_plan(idx)
    assert plan is not None
    src = _pair_representable(rng, src_len, dtype)
    got = np.asarray(
        wt.monotone_take(
            jnp.asarray(src), plan, jnp.asarray(plan.codes2d),
            jnp.asarray(plan.ws), interpret=True,
        )
    )
    np.testing.assert_array_equal(got, src[idx])


def test_window_take_strictly_monotone_bounds():
    # indptr-style: starts at 0, ends at nnz, long flat stretches
    rng = np.random.default_rng(7)
    nnz = 5000
    bounds = np.concatenate([[0], np.sort(rng.integers(0, nnz, 3_000)), [nnz]])
    plan = wt.build_plan(bounds)
    assert plan is not None
    src = _pair_representable(rng, nnz + 1, np.float64)
    got = np.asarray(
        wt.monotone_take(
            jnp.asarray(src), plan, jnp.asarray(plan.codes2d),
            jnp.asarray(plan.ws), interpret=True,
        )
    )
    np.testing.assert_array_equal(got, src[bounds])


def test_plan_rejects_non_monotone_and_wide_spans():
    rng = np.random.default_rng(0)
    assert wt.build_plan(np.array([3, 2, 5])) is None
    assert wt.build_plan(np.array([-1, 0, 1])) is None
    assert wt.build_plan(np.array([], dtype=np.int64)) is None
    # one tile spanning far more than MAX_WINDOW_ROWS*128 source entries
    jumpy = np.sort(rng.integers(0, 10**8, size=40_000))
    assert wt.build_plan(jumpy) is None


def test_plan_pads_with_last_index():
    idx = np.arange(100, 300, dtype=np.int64)
    plan = wt.build_plan(idx)
    flat = plan.codes2d.reshape(-1)
    assert flat[plan.n - 1] == 299
    assert (flat[plan.n :] == 299).all()
    assert plan.window % 8 == 0 and plan.window >= 8
    assert plan.ws.shape[0] == plan.codes2d.shape[0] // wt.BR
    assert plan.ws[0] == (100 >> 7)


def test_window_take_exact_f64_pair_values():
    # values that need both f32 planes to represent exactly
    rng = np.random.default_rng(1)
    src = _pair_representable(rng, 2000, np.float64)
    assert (src != src.astype(np.float32).astype(np.float64)).any()
    idx = _sorted_idx(rng, 5000, 2000)
    plan = wt.build_plan(idx)
    got = np.asarray(
        wt.monotone_take(
            jnp.asarray(src), plan, jnp.asarray(plan.codes2d),
            jnp.asarray(plan.ws), interpret=True,
        )
    )
    np.testing.assert_array_equal(got, src[idx])
