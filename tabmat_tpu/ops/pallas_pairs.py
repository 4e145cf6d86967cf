"""Fused slice-pair sandwich contraction: one HBM pass over the planes.

The XLA formulation of the Ozaki sandwich runs one einsum per slice pair
(28 mixed-width pairs), so every (n, k) bf16 plane is re-read from HBM
once per pair it appears in (~5.6 GB at 1M×50) and each pair writes an
(nc, k, k) f32 partial for the exact f64 chunk reduction (~2.2 GB more).
This kernel walks the row dimension ONCE: per row-tile both slice stacks
sit in VMEM, all pairs contract on the MXU, and each pair accumulates
into a resident compensated f32 pair (整数-exact to 2^48, the same
argument as the bucketed segsum).  Traffic drops to reading each plane
exactly once (~1.4 GB) plus a (n_pairs, 2, k, k) result.

Exactness: slice products are ≤ 2^15 integers (T7 × T8), a TILE=128 row
tile accumulates ≤ 2^22 in exact f32, and the TwoSum pair holds the
running integer sums to 2^48.  The f64 weighting/exponent combine runs
outside, identical to the einsum path.
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

TILE = 128  # rows per grid step: 2^15-bounded products stay exact ≤ 2^22


def _pairs_kernel(qa_ref, qb_ref, o_ref, *, pairs):
    i = pl.program_id(0)
    k = qa_ref.shape[2]
    zeros = jnp.zeros((k, k), jnp.float32)

    @pl.when(i == 0)
    def _():
        for idx in range(len(pairs)):
            o_ref[idx, 0] = zeros
            o_ref[idx, 1] = zeros

    for idx, (p, q) in enumerate(pairs):
        part = jax.lax.dot_general(
            qa_ref[p],
            qb_ref[q],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hi = o_ref[idx, 0]
        s = hi + part
        bb = s - hi
        err = (hi - (s - bb)) + (part - bb)
        o_ref[idx, 0] = s
        o_ref[idx, 1] = o_ref[idx, 1] + err


@partial(jax.jit, static_argnames=("pairs", "interpret"))
def pair_contractions(qa, qb, pairs, interpret: bool = False):
    """``out[m] = Σ_rows qa[p_m]ᵀ @ qb[q_m]`` for every (p, q) in pairs.

    qa, qb: (S, n_pad, k) bf16 integer slice planes (n_pad a TILE
    multiple, zero-padded).  Returns (len(pairs), 2, k, k) f32 hi/lo
    compensated sums — combine as ``hi.astype(f64) + lo.astype(f64)``.
    """
    S_a, n_pad, k = qa.shape
    S_b = qb.shape[0]
    kernel = partial(_pairs_kernel, pairs=tuple(pairs))
    return pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec(
                (S_a, TILE, k), lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (S_b, TILE, k), lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (len(pairs), 2, k, k),
            lambda i: (i * 0, i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((len(pairs), 2, k, k), jnp.float32),
        interpret=interpret,
    )(qa, qb)


def supported(n: int, k: int) -> bool:
    """Resident accumulators must fit VMEM alongside the plane tiles."""
    from .._config import on_tpu

    if not on_tpu():
        return False
    # 28 pairs × 2 planes × k² f32 ≤ ~4 MB → k ≤ ~160 (k = 128-padded
    # lanes inside the kernel regardless)
    return k <= 160 and n >= TILE


T7 = 7  # slice width (matches ozaki.T7)


def _sliced_pairs_kernel(yh_ref, yl_ref, qb_ref, o_ref, *, pairs, n_qa):
    """A-side slices built IN-KERNEL from the scaled f32 planes.

    Saves the HBM round trip of the 7 bf16 QA planes (~1.4 GB at 1M×50):
    the planes arrive as two (TILE, k) f32 refs and the T7 telescoping
    rounds run in VMEM.
    """
    i = pl.program_id(0)
    k = yh_ref.shape[1]
    zeros = jnp.zeros((k, k), jnp.float32)

    @pl.when(i == 0)
    def _():
        for idx in range(len(pairs)):
            o_ref[idx, 0] = zeros
            o_ref[idx, 1] = zeros

    def plane_slices(x32):
        R = [
            jnp.round(x32 * jnp.float32(2.0 ** (p * T7)))
            for p in range(n_qa + 1)
        ]
        return [R[1]] + [
            R[p + 1] - jnp.float32(1 << T7) * R[p] for p in range(1, n_qa)
        ]

    qh = plane_slices(yh_ref[:])
    ql = plane_slices(yl_ref[:])
    qa = [(a + b).astype(jnp.bfloat16) for a, b in zip(qh, ql)]

    for idx, (p, q) in enumerate(pairs):
        part = jax.lax.dot_general(
            qa[p],
            qb_ref[q],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hi = o_ref[idx, 0]
        s = hi + part
        bb = s - hi
        err = (hi - (s - bb)) + (part - bb)
        o_ref[idx, 0] = s
        o_ref[idx, 1] = o_ref[idx, 1] + err


@partial(jax.jit, static_argnames=("pairs", "n_qa", "interpret"))
def pair_contractions_sliced(yh, yl, qb, pairs, n_qa=7, interpret=False):
    """Like :func:`pair_contractions` with the A planes sliced in VMEM.

    yh, yl: (n_pad, k) f32 — the column-scaled value and its residual
    (``x·2^-e`` split at f32).  qb: (S, n_pad, k) bf16 structural slices.
    """
    n_pad, k = yh.shape
    S_b = qb.shape[0]
    kernel = partial(_sliced_pairs_kernel, pairs=tuple(pairs), n_qa=n_qa)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec(
                (TILE, k), lambda i: (i, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE, k), lambda i: (i, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (S_b, TILE, k), lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (len(pairs), 2, k, k),
            lambda i: (i * 0, i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((len(pairs), 2, k, k), jnp.float32),
        interpret=interpret,
    )(yh, yl, qb)
