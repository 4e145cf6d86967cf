"""Mosaic-native int8 grid-accumulate sandwich for wide sparse planes.

The XLA formulation of the wide int8 sandwich (``sparse_wide.py``) runs
one ``dot_general`` per symmetric slice pair (12 pairs at 49-bit
coverage), each materializing a (k, k) int32 partial in HBM that a
follow-up f64 convert/weight/add pass consumes — at the reference
``sparse_wide`` design (40k×10k) that is ~5 GB of partial traffic and
12 separate full-width matmuls that XLA runs at the bf16 MXU rate.

This kernel makes the whole contraction ONE grid walk:

- grid ``(k/TI, k/TJ, n/TK)`` with the row dimension innermost, so each
  output tile's 12 int32 pair-accumulators live in VMEM scratch across
  the row walk (products are ≤ 2^12 integers; int32 stays exact for
  n ≤ 2^18 — gated);
- per step, 12 ``int8 × int8 → int32`` MXU dots over the (TK, TI/TJ)
  plane tiles — native int8 issue, the point of the experiment (XLA
  lowers int8 matmuls at the bf16 rate);
- at the last row step the accumulators combine in-VMEM into two
  compensated f32 pairs: ``U = Σ_{p≤q} w_pq · acc_pq`` and the diagonal
  part ``D = Σ_{p=q} w_pp · acc_pp``.  Each int32 accumulator splits
  exactly into ``hi·2^12 + lo`` (both f32-exact), and the power-of-two
  weights keep every term exact, so the TwoSum chain is error-free to
  the f32-pair's ~49 bits — the platform f64 width.

The symmetric result assembles outside as ``S = U + Uᵀ − D`` (the p<q
pairs appear once in U and need their transpose; the p=q pairs must not
be doubled), cropped from the 256-lane column padding.

Counterpart of the reference CSC SpGEMM walker
(``tabmat/ext/sparse.pyx:17-77``); consumes the slice planes built by
``sparse_wide._sym_sandwich``.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_BITS = 7
TI = 256  # output tile (lanes are 128-padded; 256 keeps MXU-square dots)
TJ = 256
TK = 512  # rows per grid step (int8 sublane tile is 32 — 512 = 16 tiles)
MAX_ROWS = 1 << 18  # int32-exact accumulation bound (products ≤ 2^12)


def _two_add(hi, lo, t):
    """One error-free TwoSum step of term ``t`` into the (hi, lo) pair."""
    s = hi + t
    bb = s - hi
    return s, lo + ((hi - (s - bb)) + (t - bb))


def _int8_sandwich_kernel(pl_ref, pr_ref, o_ref, acc_ref, *, pairs, n_steps):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for idx, (p, q) in enumerate(pairs):
        part = jax.lax.dot_general(
            pl_ref[p],
            pr_ref[q],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[idx] = acc_ref[idx] + part

    @pl.when(t == n_steps - 1)
    def _():
        # exact int32 → (f32, f32) split: acc = hi·2^12 + lo with
        # |hi| ≤ 2^15 and 0 ≤ lo < 2^12, both exact in f32; terms stream
        # into the TwoSum pairs so only the running pair stays live
        zeros = jnp.zeros((acc_ref.shape[1], acc_ref.shape[2]), jnp.float32)
        uh, ul, dh, dl = zeros, zeros, zeros, zeros
        # ascending-magnitude order: small-weight terms first keeps the
        # TwoSum lo free of repeated large-hi roundings
        order = sorted(enumerate(pairs), key=lambda e: -(e[1][0] + e[1][1]))
        for idx, (p, q) in order:
            acc = acc_ref[idx]
            high = jax.lax.shift_right_arithmetic(acc, jnp.int32(12))
            low = acc - jax.lax.shift_left(high, jnp.int32(12))
            w = jnp.float32(0.5 ** ((p + q + 2) * T_BITS))
            th = high.astype(jnp.float32) * (w * jnp.float32(4096.0))
            tl = low.astype(jnp.float32) * w
            uh, ul = _two_add(uh, ul, th)
            uh, ul = _two_add(uh, ul, tl)
            if p == q:
                dh, dl = _two_add(dh, dl, th)
                dh, dl = _two_add(dh, dl, tl)
        o_ref[0] = uh
        o_ref[1] = ul
        o_ref[2] = dh
        o_ref[3] = dl


@partial(
    jax.jit, static_argnames=("pairs", "ti", "tj", "tk", "interpret")
)
def int8_pair_sandwich(
    planes, pairs, ti=TI, tj=TJ, tk=TK, interpret: bool = False
):
    """``U, D`` f32-pair contractions of stacked int8 slice planes.

    planes: (S, n_pad, k_pad) int8, n_pad % tk == 0, k_pad % ti == 0,
    zero-padded.  Returns (4, k_pad, k_pad) f32: U hi/lo, D hi/lo (see
    module docstring).  The symmetric sandwich is ``U + Uᵀ − D``.
    """
    S, n_pad, k_pad = planes.shape
    n_steps = n_pad // tk
    kernel = partial(
        _int8_sandwich_kernel, pairs=tuple(pairs), n_steps=n_steps
    )
    return pl.pallas_call(
        kernel,
        grid=(k_pad // ti, k_pad // tj, n_steps),
        in_specs=[
            pl.BlockSpec(
                (S, tk, ti),
                lambda i, j, t: (jnp.int32(0), t, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (S, tk, tj),
                lambda i, j, t: (jnp.int32(0), t, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, ti, tj),
            lambda i, j, t: (jnp.int32(0), i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((4, k_pad, k_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((len(pairs), ti, tj), jnp.int32)],
        interpret=interpret,
    )(planes, planes)


def combine_symmetric(parts, k: int) -> jax.Array:
    """``S = U + Uᵀ − D`` in f64, cropped to (k, k)."""
    U = parts[0].astype(jnp.float64) + parts[1].astype(jnp.float64)
    D = parts[2].astype(jnp.float64) + parts[3].astype(jnp.float64)
    S = U + U.T - D
    return S[:k, :k]


def supported(n_rows: int, k: int) -> bool:
    import os

    from .._config import on_tpu

    if os.environ.get("TABMAT_TPU_WIDE_MOSAIC", "0") != "1":
        return False
    if not on_tpu():
        return False
    # one padded row-block must exist and int32 accumulation stay exact
    n_pad = -(-n_rows // TK) * TK
    return TK <= n_pad <= MAX_ROWS and k >= 1
