"""All-pairs single-dot int8 dense sandwich: X.T @ diag(d) @ X.

Successor of the anti-diagonal v4 kernel (``pallas_sandwich_v4.py``).
v4 issues S_MAX = 10 int8 MXU dots per grid step, each over a
sublane-contiguous window of the plane stacks, with a (kpad, kpad)
output.  Hardware probes blamed ~40% per-dot overhead and the in-kernel
window slicing for the gap to the HBM-stream bound (7.46 ms measured vs
~1.5 ms streamed at 1M×50).

v5 removes the per-dot overhead with a layout change: stack the NP = 8
planes along the LANE axis instead of the sublane axis.  With
``A[r, p·kpad + a] = Qa_p[r, a]`` and ``B[r, q·kpad + b] = Qb_q[r, b]``
every plane pair (p, q) is a (kpad, kpad) tile of ONE dot:

    C[p·kpad + a, q·kpad + b] = Σ_r A[r, p·kpad+a] · B[r, q·kpad+b]

i.e. a single int8 dot per grid step with contraction SUB and a
(NP·kpad, NP·kpad) = (1024, 1024) int32 output-stationary accumulator —
a well-shaped large MXU matmul instead of 10 windowed small ones.  The
MAC count rises from the 49 kept anti-diagonal windows to all 64 pairs
(+31%), but all 64 pairs now contribute to the result: the v4
anti-diagonal truncation (s ≥ 10 dropped) disappears, so v5 is both
faster and *more* accurate (the only error left is the 48-bit pair
slicing + the final f64 combine).

Everything else — the f32 pair planes, the exact Dekker d-product, the
T6 = 6-bit slicing with LO_SKIP, the transposed (G8, SUB) d rows, the
Pallas eA max-prepass, the int32 → compensated-f32-pair flushes — is
shared with v4 (imported, not duplicated).  The cache layout differs
only in the B-stack: lane-major ``(n_pad, NP·kpad)`` ascending planes
instead of v4's step-interleaved sublane stack; same bytes.

Counterpart of the reference's fused dense sandwich
(``tabmat/ext/dense_helpers-tmpl.cpp:41-143``), which reads X once per
call through the L2-tiled k-loop.
"""

import os
import sys
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sandwich_v4 import (
    LANE,
    MAX_KP,
    NP,
    SUB,
    T6,
    _max_prepass,
    _plane_slices_pair,
    _two_prod_err,
    _v4_prep,
    pack_group,
)

# |slice| ≤ 65 ⇒ products ≤ 4225; per step each accumulator element sums
# SUB = 2048 rows ⇒ ≤ 2^23.1; int32 overflows after 2^31 / 2^23.1 ≈ 244
# steps — flush every 64 keeps 4× worst-case headroom.
FLUSH_EVERY = 64

# which kernel new plane caches default to; overridable per process via
# TABMAT_TPU_SANDWICH_KERNEL=v4|v5 (existing caches always dispatch by
# their own type — see module_for)
DEFAULT_KERNEL = "v4"


def preferred():
    """The module (this one or v4) new plane caches are built with."""
    from . import pallas_sandwich_v4 as v4mod

    name = os.environ.get("TABMAT_TPU_SANDWICH_KERNEL", DEFAULT_KERNEL)
    return sys.modules[__name__] if name == "v5" else v4mod


def module_for(cache):
    """Dispatch a built cache (PlaneCacheV4 or PlaneCacheV5) to its module."""
    from . import pallas_sandwich_v4 as v4mod

    return sys.modules[__name__] if isinstance(cache, PlaneCacheV5) else v4mod


class PlaneCacheV5(NamedTuple):
    """Structural caches: f32 pair planes of packed X + lane-major B."""

    xsh: jax.Array  # (n_pad, kpad) f32, |xsh| ≤ 1, zero pad rows/lanes
    xsl: jax.Array  # (n_pad, kpad) f32, xsh + xsl = Xp · exps⁻¹ exactly
    bstk: jax.Array  # (n_pad, NP·kpad) int8 — lane block q holds plane q
    exps: jax.Array  # (kpad,) f64 per-column powers of two (1 in pads)
    n: int  # original row count
    k: int  # original column count
    G: int  # row-groups packed per padded row


def _v5_kernel(
    xh_ref,
    xl_ref,
    dh_ref,
    dl_ref,
    ra_ref,
    bstk_ref,
    o_ref,
    astk_ref,
    acc_ref,
    *,
    kpad,
    k,
    n_steps,
    interpret,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        o_ref[...] = jnp.zeros_like(o_ref)

    ra = ra_ref[:]  # (1, kpad)
    xh = xh_ref[:]
    xl = xl_ref[:]

    # lane-expand d from the transposed (G8, SUB) group rows (one tiny
    # exact one-hot MXU dot per operand — see pallas_sandwich_v4)
    G8 = dh_ref.shape[0]
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (G8, kpad), 1) // jnp.int32(k)
    gsel = (
        jax.lax.broadcasted_iota(jnp.int32, (G8, kpad), 0) == lane_group
    ).astype(jnp.float32)

    def expand_d(dsub):
        return jax.lax.dot_general(
            dsub,
            gsel,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    dh = expand_d(dh_ref[:])
    dl = expand_d(dl_ref[:])

    # exact f32-pair product y = xs·ds, then the exact column scale
    p1 = xh * dh
    if interpret:
        perr = (
            xh.astype(jnp.float64) * dh.astype(jnp.float64)
            - p1.astype(jnp.float64)
        ).astype(jnp.float32)
    else:
        perr = _two_prod_err(xh, dh, p1)
    tail = perr + xh * dl + xl * dh + xl * dl
    yh = p1 * ra
    yl = tail * ra

    qa = _plane_slices_pair(yh, yl, interpret)

    # A planes ascending along lanes; ONE all-pairs dot per step
    for p in range(NP):
        astk_ref[:, pl.ds(p * kpad, kpad)] = qa[p]

    part = jax.lax.dot_general(
        astk_ref[...],
        bstk_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (NP·kpad, NP·kpad)
    acc_ref[...] = acc_ref[...] + part

    # exact flush of the int32 accumulator into a compensated f32 pair
    t32 = t.astype(jnp.int32)
    is_flush = (t32 + jnp.int32(1)) % jnp.int32(FLUSH_EVERY) == jnp.int32(0)

    @pl.when(jnp.logical_or(is_flush, t32 == jnp.int32(n_steps - 1)))
    def _():
        acc = acc_ref[...]
        high = jax.lax.shift_right_arithmetic(acc, jnp.int32(12))
        low = acc - jax.lax.shift_left(high, jnp.int32(12))
        th = high.astype(jnp.float32) * jnp.float32(4096.0)
        tl = low.astype(jnp.float32)
        hi0 = o_ref[0]
        lo0 = o_ref[1]
        # two error-free TwoSum steps into the (hi, lo) running pair
        s1 = hi0 + th
        bb = s1 - hi0
        lo0 = lo0 + ((hi0 - (s1 - bb)) + (th - bb))
        s2 = s1 + tl
        bb = s2 - s1
        lo0 = lo0 + ((s1 - (s2 - bb)) + (tl - bb))
        o_ref[0] = s2
        o_ref[1] = lo0
        acc_ref[...] = jnp.zeros_like(acc)


@partial(jax.jit, static_argnames=("k", "G", "interpret"))
def _v5_parts(xsh, xsl, dhc, dlc, ra, bstk, k, G, interpret=False):
    n_pad, kpad = xsh.shape
    npk = NP * kpad
    n_steps = n_pad // SUB
    G8 = dhc.shape[0]
    kernel = partial(
        _v5_kernel,
        kpad=kpad,
        k=k,
        n_steps=n_steps,
        interpret=interpret,
    )
    spec = pl.BlockSpec((SUB, kpad), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((G8, SUB), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(
        (SUB, npk), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            spec,
            spec,
            dspec,
            dspec,
            pl.BlockSpec((1, kpad), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
            bspec,
        ],
        out_specs=pl.BlockSpec(
            (2, npk, npk),
            lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, npk, npk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SUB, npk), jnp.int8),
            pltpu.VMEM((npk, npk), jnp.int32),
        ],
        # astk 2 MB + acc 4 MB + o 8 MB + double-buffered operands
        # (xh/xl 4 MB + bstk 4 MB) ≈ 22 MB; leave Mosaic headroom
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xsh, xsl, dhc, dlc, ra, bstk)


def estimate_cache_bytes(n: int, k: int) -> int:
    """HBM footprint of :func:`build_plane_cache` (same bytes as v4)."""
    G = pack_group(k)
    kpad = -(-(G * k) // LANE) * LANE
    n2 = -(-n // G)
    n_pad = -(-n2 // SUB) * SUB
    return (8 + NP) * n_pad * kpad


@partial(jax.jit, static_argnames=("interpret",))
def _build_bstk(xsh, xsl, interpret=False):
    """Lane-major ascending int8 plane stack of the B side."""
    qb = _plane_slices_pair(xsh, xsl, interpret)  # NP × (n_pad, kpad)
    return jnp.concatenate(qb, axis=1)  # (n_pad, NP·kpad)


def build_plane_cache(X: jax.Array, row_multiple: int = SUB) -> PlaneCacheV5:
    """Structural column-scaled packed f32 planes + lane-major B-stack.

    Same packing/scaling as v4's cache (row-groups side by side in the
    lanes; pad rows/lanes zero); only the B-stack layout differs.
    """
    n, k = X.shape
    G = pack_group(k)
    kp = G * k
    kpad = -(-kp // LANE) * LANE
    n2 = -(-n // G)
    row_multiple = max(row_multiple, SUB)
    n_pad = -(-n2 // row_multiple) * row_multiple
    Xp = jnp.pad(X, [(0, n2 * G - n), (0, 0)]).reshape(n2, kp)
    absmax = jnp.max(jnp.abs(Xp), axis=0, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exps = jnp.pad(
        jnp.exp2(e)[0].astype(jnp.float64), (0, kpad - kp), constant_values=1.0
    )
    s = Xp * jnp.exp2(-e)
    xsh = s.astype(jnp.float32)
    xsl = (s - xsh.astype(jnp.float64)).astype(jnp.float32)
    pad = [(0, n_pad - n2), (0, kpad - kp)]
    xsh = jnp.pad(xsh, pad)
    xsl = jnp.pad(xsl, pad)
    bstk = _build_bstk(xsh, xsl)
    return PlaneCacheV5(xsh, xsl, bstk, exps, n, k, G)


def supported(n: int, k: int, dtype) -> bool:
    from .._config import on_tpu

    if not on_tpu():
        return False
    return k <= MAX_KP and jnp.dtype(dtype) == jnp.float64


def sandwich_from_cache(cache: PlaneCacheV5, d) -> jax.Array:
    return _sandwich_v5_jit(
        cache.xsh,
        cache.xsl,
        cache.bstk,
        cache.exps,
        d,
        cache.n,
        cache.k,
        cache.G,
    )


def _v5_combine(tot, eA, eD, exps, k, G):
    """Weight the (p, q) plane-pair tiles and fold the packed groups."""
    kpad = exps.shape[0]
    kp = G * k
    tot4 = tot.reshape(NP, kpad, NP, kpad)
    p_i = jnp.arange(NP, dtype=jnp.float64)[:, None]
    q_i = jnp.arange(NP, dtype=jnp.float64)[None, :]
    w = jnp.exp2(-(T6 * (p_i + q_i + 2.0)))
    out = jnp.einsum("paqb,pq->ab", tot4, w)
    scale_a = jnp.exp2(eA + eD) * exps[:kp]
    out = out[:kp, :kp] * (scale_a[:, None] * exps[None, :kp])
    out4 = out.reshape(G, k, G, k)
    gi = jnp.arange(G)
    return out4[gi, :, gi, :].sum(axis=0)


@partial(jax.jit, static_argnames=("n", "k", "G", "interpret"))
def _sandwich_v5_jit(xsh, xsl, bstk, exps, d, n, k, G, interpret=False):
    """Exact ``X.T @ diag(d) @ X`` from the v5 plane cache."""
    dhc, dlc, ra, eA, eD = _v4_prep(xsh, d, n, k, G, interpret=interpret)
    parts = _v5_parts(xsh, xsl, dhc, dlc, ra, bstk, k, G, interpret=interpret)
    tot = parts[0].astype(jnp.float64) + parts[1].astype(jnp.float64)
    return _v5_combine(tot, eA, eD, exps, k, G)


def tmv_from_cache(cache: PlaneCacheV5, r) -> jax.Array:
    """``X.T @ r`` from the v5 lane-major B-stack (no Pallas).

    Same batched int8 MXU formulation as v4's cache-shared tmv — one dot
    per grid step reading the B-stack once — with the lane-major layout
    the contraction is simply (n_steps, NP·G, SUB) × (n_steps, SUB,
    NP·kpad).  All 64 (p, q) plane pairs kept; relerr ≲ 1e-15.

    Counterpart of the reference's dense transpose-matvec
    (``tabmat/ext/dense_helpers-tmpl.cpp:286-344``).
    """
    return _tmv_v5_jit(cache.bstk, cache.exps, r, cache.n, cache.k, cache.G)


@partial(jax.jit, static_argnames=("n", "k", "G"))
def _tmv_v5_jit(bstk, exps, r, n, k, G):
    npk = bstk.shape[1]
    kpad = npk // NP
    kp = G * k
    n_pad = bstk.shape[0]
    n_steps = n_pad // SUB
    n2 = -(-n // G)
    r = jnp.asarray(r, dtype=jnp.float64)
    mr = jnp.max(jnp.abs(r))
    er = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(mr, 1e-300))), -1000.0, 1000.0)
    rs = r * jnp.exp2(-er)
    rh = rs.astype(jnp.float32)
    rl = (rs - rh.astype(jnp.float64)).astype(jnp.float32)

    def compact_T(v):  # (n,) → (G, n_pad) transposed group rows
        v = jnp.pad(v, (0, n2 * G - n))
        rows = [jax.lax.slice(v, (g,), (n2 * G,), (G,)) for g in range(G)]
        return jnp.pad(jnp.stack(rows, axis=0), [(0, 0), (0, n_pad - n2)])

    qr = jnp.stack(
        _plane_slices_pair(compact_T(rh), compact_T(rl), False), axis=0
    )  # (NP, G, n_pad) int8-valued, lane-major rows
    lhs = qr.reshape(NP, G, n_steps, SUB).transpose(2, 0, 1, 3)
    lhs = lhs.reshape(n_steps, NP * G, SUB)
    rhs = bstk.reshape(n_steps, SUB, npk)
    oi = jax.lax.dot_general(
        lhs,
        rhs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (n_steps, NP·G, NP·kpad), exact
    o = jnp.sum(
        oi.reshape(n_steps, NP, G, NP, kpad).astype(jnp.float64), axis=0
    )  # (NP, G, NP, kpad) — q ascending in the lane blocks
    p_i = jnp.arange(NP)[:, None]
    q_i = jnp.arange(NP)[None, :]
    w = jnp.exp2(-(T6 * (p_i + q_i + 2)).astype(jnp.float64))
    og = jnp.einsum("pgqk,pq->gk", o, w)[:, :kp].reshape(G, G, k)
    gi = jnp.arange(G)
    out = og[gi, gi, :] * exps[:kp].reshape(G, k)  # group g × its own lanes
    return jnp.sum(out, axis=0) * jnp.exp2(er)
