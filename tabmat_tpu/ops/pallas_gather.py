"""Pallas table-gather: ``out[i] = table[codes[i]]`` at VPU speed.

XLA's gather on this TPU runs element-serial (~13 ns/element measured at
1M f64 — 0.6 GB/s), which makes it the dominant cost of every categorical
matvec (reference kernel: ``tabmat/ext/categorical.pyx:128-151``).  Mosaic
exposes the hardware lane-shuffle as ``tpu.dynamic_gather`` (lowered from
``jnp.take_along_axis`` on a (rows, 128) tile), but only *within* a
128-wide row.  This kernel builds an arbitrary-size table gather out of it:

- the table is laid out as (C, 128) in VMEM (C = ceil(T/128), zero-padded);
- codes are processed in (BR, 128) tiles; per tile the kernel loops over
  the C table rows, lane-gathers ``row[lo]`` for every element, and keeps
  the result where ``hi == c`` — a select-accumulate over table rows;
- cost ≈ C/256 cycles/element: beats the XLA gather for any C ≲ 3000
  (tables up to ~400k entries), typically by 5–15×.

Out-of-range codes (negative sentinels from ``drop_first``/missing
handling, or width-pads from stacked categoricals) never match a table row
and therefore yield exact zeros — the semantics every categorical matvec
in this library needs anyway.

float64 tables are gathered as two f32 planes (hi = f32(x), lo =
f32(x - hi)) in one kernel and re-assembled outside.  Pallas has no f64
refs on TPU, and the platform's X64 rewriter cannot emulate a bitcast of
f64 — but it *stores and computes* f64 as exactly this float-float pair,
so the split/recombine round-trips every value the device can represent.
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np

LANE = 128
BR = 256  # code rows per grid step (BR*LANE codes)


def build_codes2d(codes: np.ndarray) -> np.ndarray:
    """Host-side: pad codes to (R, 128) int32 with -1 (gathers to 0).

    The result is structural (per matrix) — upload once and reuse.
    """
    codes = np.asarray(codes)
    n = len(codes)
    rows = -(-n // LANE)
    rows_pad = -(-rows // BR) * BR
    out = np.full(rows_pad * LANE, -1, dtype=np.int32)
    out[:n] = codes.astype(np.int32, copy=False)
    return out.reshape(rows_pad, LANE)


def _pad_table_2d(table: jax.Array) -> jax.Array:
    """(T,) → (C, 128) zero-padded."""
    T = table.shape[0]
    C = -(-T // LANE)
    pad = C * LANE - T
    return jnp.pad(table, (0, pad)).reshape(C, LANE)


_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(1,),
    start_index_map=(1,),
    operand_batching_dims=(0,),
    start_indices_batching_dims=(0,),
)


def _lane_gather(bcast: jax.Array, lo: jax.Array) -> jax.Array:
    """``bcast[i, lo[i, j]]`` — lowers to ``tpu.dynamic_gather``.

    ``jnp.take_along_axis`` would build the same lax.gather but materializes
    int64 index arithmetic under x64, which Mosaic refuses; calling
    ``lax.gather`` with int32 indices directly keeps the kernel 32-bit.
    ``lo`` is pre-masked to [0, 128) so PROMISE_IN_BOUNDS is sound.
    """
    return jax.lax.gather(
        bcast,
        lo[..., None],
        _DNUMS,
        (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_kernel_1plane(tab_ref, c_ref, o_ref):
    C = tab_ref.shape[0]
    codes = c_ref[:]
    # negative sentinels: arithmetic shift makes hi negative → matches no
    # table row → exact zero; lo may point anywhere, its value is dropped
    hi = codes >> 7
    lo = codes & (LANE - 1)

    def body(t, acc):
        row = tab_ref[pl.ds(t, 1), :]
        bcast = jnp.broadcast_to(row, (BR, LANE))
        g = _lane_gather(bcast, lo)
        return jnp.where(hi == t, g, acc)

    # int32 bounds: under x64 a Python-int bound makes the index int64,
    # which Mosaic cannot lower
    o_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(C), body, jnp.zeros((BR, LANE), tab_ref.dtype)
    )


def _gather_kernel_2plane(t0_ref, t1_ref, c_ref, o0_ref, o1_ref):
    C = t0_ref.shape[0]
    codes = c_ref[:]
    hi = codes >> 7
    lo = codes & (LANE - 1)

    def body(t, accs):
        a0, a1 = accs
        keep = hi == t
        r0 = jnp.broadcast_to(t0_ref[pl.ds(t, 1), :], (BR, LANE))
        r1 = jnp.broadcast_to(t1_ref[pl.ds(t, 1), :], (BR, LANE))
        a0 = jnp.where(keep, _lane_gather(r0, lo), a0)
        a1 = jnp.where(keep, _lane_gather(r1, lo), a1)
        return a0, a1

    z = jnp.zeros((BR, LANE), t0_ref.dtype)
    o0, o1 = jax.lax.fori_loop(jnp.int32(0), jnp.int32(C), body, (z, z))
    o0_ref[:] = o0
    o1_ref[:] = o1


@partial(jax.jit, static_argnames=("n",))
def _gather_f32(table: jax.Array, codes2d: jax.Array, n: int) -> jax.Array:
    tab2d = _pad_table_2d(table)
    C = tab2d.shape[0]
    R = codes2d.shape[0]
    out = pl.pallas_call(
        _gather_kernel_1plane,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((C, LANE), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, LANE), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, LANE), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANE), table.dtype),
    )(tab2d, codes2d)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("n",))
def _gather_f64(table: jax.Array, codes2d: jax.Array, n: int) -> jax.Array:
    hi = table.astype(jnp.float32)
    lo = (table - hi.astype(jnp.float64)).astype(jnp.float32)
    t0 = _pad_table_2d(hi)
    t1 = _pad_table_2d(lo)
    C = t0.shape[0]
    R = codes2d.shape[0]
    o0, o1 = pl.pallas_call(
        _gather_kernel_2plane,
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec((C, LANE), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, LANE), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, LANE), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BR, LANE), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, LANE), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        ],
    )(t0, t1, codes2d)
    out = o0.astype(jnp.float64) + o1.astype(jnp.float64)
    return out.reshape(-1)[:n]


# largest table routed through the kernel: C = 4096 rows ≈ 524k entries
# (cost ∝ C; the XLA gather wins past C ≈ 3000 in f32, ~6000 in f64 —
# 4096 keeps the one_cat benchmark design, 100k categories, on-kernel)
MAX_TABLE_ROWS = 4096


def supported(table_len: int, dtype) -> bool:
    """Can/should this gather run on the Pallas kernel?"""
    from .._config import on_tpu

    if not on_tpu():
        return False
    if -(-table_len // LANE) > MAX_TABLE_ROWS:
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.float64)


def table_gather(table: jax.Array, codes2d: jax.Array, n: int) -> jax.Array:
    """``table[codes]`` for flat padded (R, 128) codes → (n,) values.

    Out-of-range / negative codes yield 0.  ``codes2d`` comes from
    :func:`build_codes2d` (structural, cached by the owning matrix).
    """
    if table.dtype == jnp.float64:
        return _gather_f64(table, codes2d, n)
    return _gather_f32(table, codes2d, n)
