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

Layout note: all codes ride ONE lane-major (SUPER, TILE) block per grid
step (a (n, 1) sublane-major operand would tile as (8, 128) VMEM blocks
— 128× waste, which alone blows the 16 MB scoped-VMEM budget).  A fori
loop processes one BTILE half-row at a time, extracting it by masked
row-reduction (Mosaic rejects 1-sublane slices), and BOTH one-hots are
built lane-major — L transposed and contracted via a transposed-rhs
dot_general.

Exactness: identical argument to the flat kernel — slice values are ≤2^T
integers in bf16, H/L are 0/1, so every per-BTILE partial is an exact
≤ 2^(T+10) integer in f32; a super-step accumulates 16 BTILEs in
registers (≤ 2^22) and super-steps accumulate into a resident
compensated f32 pair (exact integers to 2^48); the pair/slice
reduction runs in f64 outside.
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
BTILE = 1024  # rows per inner step: half the shared TILE keeps VMEM temps small
SUPER = 8  # row-tiles per grid step (legal sublane-major codes block)
MAX_W_BUCKETED = 1 << 17  # b_pad ≤ 2^17/WB = 256 → panels stay VMEM-sized
MIN_W_BUCKETED = (1 << 9) + 1  # at W ≤ Wb the flat kernel is the same compare count


def supported(num_segments: int, dtype=jnp.float64, n: int = 0) -> bool:
    from .._config import on_tpu

    if not on_tpu():
        return False
    if not (MIN_W_BUCKETED <= num_segments <= MAX_W_BUCKETED) or n > MAX_N:
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.float64)


def _segsum_bucketed_kernel(crow_ref, q_ref, o_ref, *, shift, wb, b_pad):
    i = pl.program_id(0)
    n_s = q_ref.shape[0]
    zeros2d = jnp.zeros((n_s * b_pad, wb), jnp.float32)

    # the (2, S·b_pad, wb) out block is addressed by its 2-D leading rows —
    # rank-broadcast stores into a 3-D ref fail Mosaic's convert lowering
    @pl.when(i == 0)
    def _():
        o_ref[0] = zeros2d
        o_ref[1] = zeros2d

    # loop-invariant iotas hoisted out of the body (VMEM stack pressure)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (wb, BTILE), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (b_pad, BTILE), 0)
    iota_sel = jax.lax.broadcasted_iota(jnp.int32, (SUPER, BTILE), 0)

    # a fori (not a static unroll) keeps one iteration's temporaries on the
    # Mosaic stack — the unrolled form allocated all iterations at once
    # (VMEM OOM).  Each fori step covers one BTILE row-block; the crow
    # block holds SUPER·TILE codes as (SUPER, TILE), i.e. two BTILE
    # half-rows per sublane row.
    def body(j, acc):
        # lane-major codes for this BTILE without a (1-sublane) dynamic
        # slice: masked reduction over the (SUPER, TILE) block — half-row
        # h = j % (TILE // BTILE) of sublane row j // (TILE // BTILE).
        # (A sublane-major (n, 1) codes operand is deliberately ABSENT:
        # its (8, 128)-tiled VMEM blocks waste 128×, which alone blew the
        # 16 MB scoped-VMEM budget.)
        halves = TILE // BTILE
        r = j // jnp.int32(halves)
        h = j % jnp.int32(halves)
        sel = iota_sel == r
        seg = jnp.where(
            sel, crow_ref[:, pl.ds(h * BTILE, BTILE)], jnp.int32(0)
        )
        # dtype pinned: under x64 an int32 jnp.sum promotes to int64,
        # which Mosaic refuses
        crow_j = jnp.sum(seg, axis=0, keepdims=True, dtype=jnp.int32)
        # low-bit one-hot, TRANSPOSED (wb, BTILE) — built lane-major like
        # H and contracted via a transposed-rhs dot, so no sublane-major
        # codes are ever needed.  Negative codes alias l = wb-1 but their
        # bucket row in H is all-zero, so the alias receives q·0
        lo = crow_j & (wb - 1)
        Lt = (lo == iota_l).astype(jnp.bfloat16)
        # high-bit one-hot, bucket-major (b_pad, BTILE); the row reduction
        # zeroes only NON-selected rows, so -1 sentinels in the selected
        # row survive, stay negative under the arithmetic shift, and
        # match no bucket
        hi = crow_j >> shift
        H = (hi == iota_h).astype(jnp.bfloat16)
        q = q_ref[:, pl.ds(j * BTILE, BTILE)]  # (S, BTILE) bf16 slices
        P = (q[:, None, :] * H[None, :, :]).reshape(n_s * b_pad, BTILE)
        return acc + jax.lax.dot_general(
            P,
            Lt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    n_inner = SUPER * (TILE // BTILE)
    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_inner), body, zeros2d)
    # compensated (TwoSum) accumulation into a resident f32 pair: the
    # per-super-step partials are exact ≤2^22 integers, the pair holds the
    # exact running integer sum to 2^48 — no per-group output paging (a
    # grouped (n_groups, ·, ·) result kept the whole array in scoped VMEM
    # and overflowed the 16 MB limit)
    hi = o_ref[0]
    s = hi + acc
    bb = s - hi
    err = (hi - (s - bb)) + (acc - bb)
    o_ref[0] = s
    o_ref[1] = o_ref[1] + err


@partial(jax.jit, static_argnames=("wb", "b_pad", "interpret"))
def _segsum_bucketed_parts(q, codes_col, wb, b_pad, interpret=False):
    """(S, n_sup) slices × structural codes → (n_groups, S·b_pad, wb) f32.

    Inputs are already padded to a SUPER·TILE multiple (``_pad_super``).
    """
    n_s, n_sup = q.shape
    n_super = n_sup // (SUPER * TILE)
    codes_row = codes_col.reshape(n_super * SUPER, TILE)
    shift = int(wb).bit_length() - 1
    kernel = partial(_segsum_bucketed_kernel, shift=shift, wb=wb, b_pad=b_pad)
    return pl.pallas_call(
        kernel,
        grid=(n_super,),
        in_specs=[
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
            (2, n_s * b_pad, wb),
            lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, n_s * b_pad, wb), jnp.float32),
        interpret=interpret,
    )(codes_row, q)


def _slice_rows_1d(values: jax.Array, n_pad: int):
    """Integer bf16 slice rows of a (n,) value vector (f32-plane scheme).

    ``ozaki.slice_vector_f32planes`` replaces 7 sequential emulated-f64
    round/sub passes with fused native-f32 rounds — the slicing used to
    rival the kernel itself at 1M rows.  Slice width is ozaki.T7 = 7 bits
    (49-bit coverage; the platform f64 pair carries 48).
    """
    n_slices = 4 if values.dtype == jnp.float32 else 7  # 4·7 = 28 ≥ 24 bits
    q, exp = ozaki.slice_vector_f32planes(values, n_slices)
    return jnp.pad(q, ((0, 0), (0, n_pad - values.shape[0]))), exp, n_slices


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
    # the kernel's compensated f32 pair sums exactly in f64
    tot = parts[0].astype(jnp.float64) + parts[1].astype(jnp.float64)
    tot = tot.reshape(n_slices, b_pad, wb)
    weights = jnp.asarray(
        [0.5 ** ((p + 1) * ozaki.T7) for p in range(n_slices)],
        dtype=jnp.float64,
    )
    out = jnp.einsum("sbw,s->bw", tot, weights).reshape(-1)[:num_segments]
    return (out * exp).astype(in_dtype)
