"""MXU segment-sum: ``out[c] = Σ_{i: code_i == c} v_i`` as one-hot matmuls.

The SegmentPlan pipeline (``segments.py``) costs one n-length permutation
gather (element-serial on this TPU, ~13 ns/elem) plus an n-length f64
cumsum per reduction.  This kernel instead contracts the values against an
on-the-fly one-hot matrix on the MXU — the reduction the reference does
with scatter-adds (``tabmat/ext/cat_split_helpers-tmpl.cpp:4-94``), recast
as dense linear algebra:

- per (row-tile, column-chunk) grid step, build ``onehot[i, c] =
  (code_i == c)`` in VMEM (never materialized to HBM) and compute
  ``q_tile (M, TILE) @ onehot (TILE, WCH)`` on the MXU;
- the lhs rows are **error-free bf16 slices** of the values (Ozaki
  scheme, see ``ops/ozaki.py``): slice integers are ≤ 2^8, so each f32
  partial over a 4096-element tile is an exact ≤ 2^20 integer;
- per-tile partials are reduced across tiles in f64 outside the kernel —
  the whole reduction is exactly rounded, like the SegmentPlan path.

Cost: n·W one-hot compares (VPU) + S·n·W bf16 MACs (MXU) — for 1M rows
and W ≤ ~16k this is single-digit ms, 3-10× under the gather pipeline.
Larger W (or CPU) falls back to the SegmentPlan automatically.

Multi-row lhs (``M = S·m`` for m value columns) computes m segment-sums in
one pass — used by the categorical×dense cross-sandwich.
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np

from . import ozaki

TILE = 2048  # elements per row-tile: slice-sums stay exact ≤ 2^(8+11) in f32
WCH = 1024  # one-hot column chunk: (TILE, WCH) bf16 = 4 MB VMEM
# (swept on hardware at 1M×10k: (2048,1024) beats (4096,512) by 11% and
# (8192,256) by 35%; the kernel is VPU-compare-bound — n·W one-hot builds
# dominate, so slice count and MXU shape barely matter)
MAX_W = 1 << 14  # beyond this the one-hot compares lose to the gather plan


MAX_N = 1 << 24  # per-tile partials memory stays bounded


def supported(num_segments: int, dtype=jnp.float64, n: int = 0) -> bool:
    from .._config import on_tpu

    if not on_tpu():
        return False
    if num_segments > MAX_W or n > MAX_N:
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.float64)


# flat kernel below this width (n·W compares already ≤ the bucketed
# kernel's n·Wb L-build); bucketed above, up to its 2^17 cap
# (measured 1M rows: bucketed 1.43 ms @ W=10k vs flat 3.5 ms @ W=1k)
ROUTE_W = 1 << 9


def supported_any(num_segments: int, dtype=jnp.float64, n: int = 0) -> bool:
    """True when EITHER one-hot segsum kernel covers this width."""
    from . import pallas_segsum_bucketed as psb

    return supported(num_segments, dtype, n) or psb.supported(
        num_segments, dtype, n
    )


def segsum_auto(values, codes_col, num_segments: int):
    """Route a 1-D segment-sum to the flat or bucketed kernel by width."""
    if num_segments > ROUTE_W:
        from . import pallas_segsum_bucketed as psb

        if psb.supported(num_segments, values.dtype, n=0):
            return psb.segsum_bucketed(values, codes_col, num_segments)
    return segsum(values, codes_col, num_segments)


def build_codes_col(codes: np.ndarray) -> np.ndarray:
    """Host-side structural layout: (n_pad, 1) int32, padded with -1.

    Out-of-range codes (missing/drop_first sentinels and the padding)
    match no one-hot column and contribute exact zeros.
    """
    codes = np.asarray(codes)
    n = len(codes)
    n_pad = -(-n // TILE) * TILE
    out = np.full((n_pad, 1), -1, dtype=np.int32)
    out[:n, 0] = codes.astype(np.int32, copy=False)
    return out


def _segsum_kernel(c_ref, q_ref, o_ref):
    base = pl.program_id(1) * WCH
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, WCH), 1) + base
    onehot = (c_ref[:] == iota).astype(jnp.bfloat16)
    o_ref[0] = jax.lax.dot_general(
        q_ref[:],
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("w_pad",))
def _segsum_parts(q: jax.Array, codes_col: jax.Array, w_pad: int) -> jax.Array:
    """(M, n_pad) bf16 slices × structural codes → (n_tiles, M, w_pad) f32."""
    M, n_pad = q.shape
    grid = (n_pad // TILE, w_pad // WCH)
    return pl.pallas_call(
        _segsum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE, 1), lambda i, j: (i, jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (M, TILE), lambda i, j: (jnp.int32(0), i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, M, WCH), lambda i, j: (i, jnp.int32(0), j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], M, w_pad), jnp.float32),
    )(codes_col, q)


def _slice_rows(values: jax.Array, n_pad: int):
    """Integer bf16 slice rows of a value vector (or (n, m) columns).

    f32-plane extraction (``ozaki.slice_matrix_f32planes``): T7 = 7-bit
    levels from the platform's native (hi, lo) f32 pair via fused
    independent f32 rounds — the sequential emulated-f64 passes used to
    rival the kernels themselves at 1M rows.  Returns
    (q (S·m, n_pad) bf16, exps (m,) f64, n_slices): f64 → 7 slices
    (49-bit coverage; the platform pair carries 48), f32 → 4 (28 ≥ 24).
    """
    n_slices = 4 if values.dtype == jnp.float32 else 7
    v2d = values[:, None] if values.ndim == 1 else values
    n, m = v2d.shape
    q, exps = ozaki.slice_matrix_f32planes(v2d.astype(jnp.float64), n_slices)
    q = jnp.transpose(q, (0, 2, 1)).reshape(n_slices * m, n)
    return jnp.pad(q, ((0, 0), (0, n_pad - n))), exps, n_slices


@partial(jax.jit, static_argnames=("num_segments",))
def segsum(values: jax.Array, codes_col: jax.Array, num_segments: int) -> jax.Array:
    """Exact segment-sum of a vector → (num_segments,) in values' dtype."""
    out = segsum_2d(values[:, None], codes_col, num_segments)
    return out[:, 0]


@partial(jax.jit, static_argnames=("num_segments",))
def segsum_2d(values: jax.Array, codes_col: jax.Array, num_segments: int) -> jax.Array:
    """Exact column-wise segment-sum of (n, m) values → (num_segments, m)."""
    in_dtype = values.dtype
    n_pad = codes_col.shape[0]
    m = values.shape[1]
    q, exps, n_slices = _slice_rows(values, n_pad)
    w_pad = -(-num_segments // WCH) * WCH
    parts = _segsum_parts(q, codes_col, w_pad)
    # exact: per-tile partials are ≤2^20 f32 integers; the cross-tile and
    # cross-slice reductions run in f64 with the tracked slice weights
    tot = jnp.sum(parts, axis=0, dtype=jnp.float64)  # (S·m, w_pad)
    tot = tot.reshape(n_slices, m, w_pad)
    weights = jnp.asarray(
        [0.5 ** ((p + 1) * ozaki.T7) for p in range(n_slices)], dtype=jnp.float64
    )
    out = jnp.einsum("smw,s->wm", tot, weights) * exps[None, :]
    return out[:num_segments].astype(in_dtype)
