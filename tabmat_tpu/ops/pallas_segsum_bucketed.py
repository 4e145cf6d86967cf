"""Bucketed MXU segment-sum for wide code spaces (2^10 < W ≤ 2^17).

The flat one-hot kernel (``pallas_segsum.py``) compares every element
against every segment — n·W VPU compares, which caps it at W ≤ 2^14 and
makes W = 10k designs compare-bound (~9 ms at 1M rows).  This kernel
factorizes the one-hot through the code's high/low bits
(``w = b·Wb + l``):

    out[b·Wb + l] = Σ_i  (q_s[i] · H[b, i]) · L[i, l]
    H[b, i] = (code_i >> log2(Wb) == b)      (B-wide compare)
    L[i, l] = (code_i & (Wb-1) == l)         (Wb-wide compare)

Per row-tile the kernel builds H (b_pad, TILE) and L (TILE, Wb) in VMEM,
forms the slice-bucket panel ``P[s·b_pad + b, i] = q_s[i]·H[b, i]`` and
contracts ``P @ L`` on the MXU.  Compare cost drops from n·W to
n·(Wb + B); the MXU contraction S·n·b_pad·Wb ≈ S·n·W is the remaining
floor (~1 ms per 10^11 MACs on the target chip).

Layout note: H needs the codes lane-major ((1, TILE) rows) while L needs
them sublane-major ((TILE, 1) columns).  Mosaic rejects 1-sublane blocks,
so the grid walks SUPER=8 tiles per step — the lane-major codes arrive as
a legal (8, TILE) block and a statically unrolled loop processes one
sublane row at a time.

Exactness: identical argument to the flat kernel — slice values are ≤2^T
integers in bf16, H/L are 0/1, so every per-tile partial is an exact
≤ 2^(T+11) integer in f32; a super-step accumulates 8 tiles in registers
(≤ 2^22) and GROUP_SUPER=4 super-steps land in one output block (≤ 2^24,
still exact); the cross-group/slice reduction runs in f64 outside.
Counterpart of the reference's scatter-add segment kernels
(``tabmat/ext/cat_split_helpers-tmpl.cpp:4-41``).
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

from . import ozaki
from .pallas_segsum import TILE, MAX_N, build_codes_col  # noqa: F401  (shared layout)

WB = 512  # low-bit width: L-compare cost n·WB vs MXU padding waste tradeoff
SUPER = 8  # row-tiles per grid step (legal sublane-major codes block)
GROUP_SUPER = 4  # super-steps per output block: 2^(8+11+3+2) = 2^24 exact f32
MAX_W_BUCKETED = 1 << 17  # b_pad ≤ 2^17/WB = 256 → panels stay VMEM-sized
MIN_W_BUCKETED = (1 << 10) + 1  # below this the flat kernel's n·W is already ≤ n·Wb


def supported(num_segments: int, dtype=jnp.float64, n: int = 0) -> bool:
    from .._config import on_tpu

    if not on_tpu():
        return False
    if not (MIN_W_BUCKETED <= num_segments <= MAX_W_BUCKETED) or n > MAX_N:
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.float64)


def _segsum_bucketed_kernel(ccol_ref, crow_ref, q_ref, o_ref, *, shift, wb, b_pad):
    i = pl.program_id(0)
    n_s = q_ref.shape[0]
    zeros2d = jnp.zeros((n_s * b_pad, wb), jnp.float32)

    # the (1, S·b_pad, wb) out block is addressed as its 2-D leading row —
    # rank-broadcast stores into a 3-D ref fail Mosaic's convert lowering
    @pl.when(i % jnp.int32(GROUP_SUPER) == 0)
    def _():
        o_ref[0] = zeros2d

    acc = zeros2d
    for j in range(SUPER):  # static unroll: no dynamic sublane slicing
        ccol = ccol_ref[j * TILE : (j + 1) * TILE, :]  # (TILE, 1) int32
        crow = crow_ref[j : j + 1, :]  # (1, TILE) — same codes, lane-major
        # low-bit one-hot (TILE, wb); negative codes alias l = wb-1 but
        # their bucket row in H is all-zero, so the alias receives q·0
        lo = ccol & (wb - 1)
        L = (
            lo == jax.lax.broadcasted_iota(jnp.int32, (TILE, wb), 1)
        ).astype(jnp.bfloat16)
        # high-bit one-hot, bucket-major (b_pad, TILE); arithmetic shift
        # keeps sentinels negative → they match no bucket
        hi = crow >> shift
        H = (
            hi == jax.lax.broadcasted_iota(jnp.int32, (b_pad, TILE), 0)
        ).astype(jnp.bfloat16)
        q = q_ref[:, j * TILE : (j + 1) * TILE]  # (S, TILE) bf16 slices
        P = (q[:, None, :] * H[None, :, :]).reshape(n_s * b_pad, TILE)
        acc = acc + jax.lax.dot_general(
            P,
            L,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = o_ref[0] + acc


@partial(jax.jit, static_argnames=("wb", "b_pad", "interpret"))
def _segsum_bucketed_parts(q, codes_col, wb, b_pad, interpret=False):
    """(S, n_sup) slices × structural codes → (n_groups, S·b_pad, wb) f32.

    Inputs are already padded to a SUPER·TILE multiple (``_pad_super``).
    """
    n_s, n_sup = q.shape
    n_super = n_sup // (SUPER * TILE)
    n_groups = -(-n_super // GROUP_SUPER)
    codes_row = codes_col.reshape(n_super * SUPER, TILE)
    shift = int(wb).bit_length() - 1
    kernel = partial(_segsum_bucketed_kernel, shift=shift, wb=wb, b_pad=b_pad)
    return pl.pallas_call(
        kernel,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (SUPER * TILE, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUPER, TILE), lambda i: (i, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_s, SUPER * TILE),
                lambda i: (i * 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_s * b_pad, wb),
            lambda i: (i // jnp.int32(GROUP_SUPER), i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, n_s * b_pad, wb), jnp.float32),
        interpret=interpret,
    )(codes_col, codes_row, q)


def _slice_rows_1d(values: jax.Array, n_pad: int):
    """Error-free bf16 slice rows of a (n,) value vector.

    Same scheme as ``pallas_segsum._slice_rows`` restricted to vectors:
    f32 → 3 slices, f64 → ozaki.S slices of T bits each.
    """
    n_slices = 3 if values.dtype == jnp.float32 else ozaki.S
    v = values.astype(jnp.float64)
    absmax = jnp.max(jnp.abs(v))
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exp = jnp.exp2(e)
    r = v * jnp.exp2(-e)
    slices = []
    for p in range(n_slices):
        qp = jnp.round(r * jnp.float64(1 << ((p + 1) * ozaki.T)))
        slices.append(qp.astype(jnp.bfloat16))
        r = r - qp * (0.5 ** ((p + 1) * ozaki.T))
    q = jnp.stack(slices)  # (S, n)
    return jnp.pad(q, ((0, 0), (0, n_pad - v.shape[0]))), exp, n_slices


@partial(jax.jit, static_argnames=("num_segments", "wb", "interpret"))
def segsum_bucketed(
    values: jax.Array,
    codes_col: jax.Array,
    num_segments: int,
    wb: int = WB,
    interpret: bool = False,
) -> jax.Array:
    """Exact segment-sum of a vector over a wide code space.

    ``codes_col`` is the (n_pad, 1) structural layout from
    :func:`pallas_segsum.build_codes_col` — shared with the flat kernel,
    so matrices carry ONE layout for both routes.  The SUPER·TILE repad
    happens here on device (cheap, int32).
    """
    in_dtype = values.dtype
    n_pad = codes_col.shape[0]
    n_sup = -(-n_pad // (SUPER * TILE)) * (SUPER * TILE)
    q, exp, n_slices = _slice_rows_1d(values, n_sup)
    ccol = jnp.pad(codes_col, ((0, n_sup - n_pad), (0, 0)), constant_values=-1)
    b_pad = -(-(-(-num_segments // wb)) // 8) * 8
    parts = _segsum_bucketed_parts(q, ccol, wb, b_pad, interpret=interpret)
    tot = jnp.sum(parts, axis=0, dtype=jnp.float64)  # (S·b_pad, wb)
    tot = tot.reshape(n_slices, b_pad, wb)
    weights = jnp.asarray(
        [0.5 ** ((p + 1) * ozaki.T) for p in range(n_slices)],
        dtype=jnp.float64,
    )
    out = jnp.einsum("sbw,s->bw", tot, weights).reshape(-1)[:num_segments]
    return (out * exp).astype(in_dtype)
