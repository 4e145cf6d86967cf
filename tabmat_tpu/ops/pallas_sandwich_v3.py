"""One-pass self-slicing dense sandwich: X.T @ diag(d) @ X in one HBM sweep.

The round-2 fused pairs kernel still paid three structural costs at
1M×50: (a) a separate multi-pass XLA "prep" that materialized the
d-scaled side's f32 planes in HBM (~7 ms), (b) 28 *separate* small MXU
dots per 128-row tile, each with a (50, 50) output that uses ~15% of the
128×128 systolic array and pays per-issue latency (~13 ms), and (c) an
HBM read of the 7-plane bf16 structural cache (~700 MB) *on top of* the
d-side planes.

This kernel removes all three.  Per matrix we cache the column-scaled
f32 planes ``(xsh, xsl)`` with ``xsh + xsl = X·2^-e`` exactly (the
platform stores f64 as an (hi, lo) f32 pair, so the split is lossless —
see ``ozaki.slice_matrix_f32planes``).  Per call the kernel walks the
rows ONCE; for each 128-row sub-tile, in VMEM it:

1. forms the exact f32-pair product ``y = xs · ds · 2^-eA`` with a
   Veltkamp/Dekker two-product (no FMA on the VPU; the trick is safe
   *inside* Pallas — the jaxpr is lowered directly by Mosaic, unlike
   XLA whose algebraic simplifier folds ``(t - (t - a))`` back to ``a``,
   ``ozaki.py:50-52``),
2. extracts T7-bit integer slice planes of BOTH sides by fused
   telescoping f32 rounds (``qa`` from y, ``qb`` from xs directly),
3. concatenates the 7 planes of each side along lanes and contracts
   them in ONE (128 → 350×350) MXU dot — every slice pair (p, q) lands
   in block (p, q) of the output, at ~47% MXU utilization instead of
   15%, with one issue instead of 28,
4. accumulates the exact integer partials into a compensated f32
   TwoSum pair carried through the sub-tile loop and resident in VMEM
   across grid steps.

Exactness: slice magnitudes are ≤ ~260 (T7 round overshoot ×2 planes,
exact in bf16 ≤ 512), products ≤ 2^16.1 integers, one 128-row dot
accumulates ≤ 2^23.1 in exact f32, and the TwoSum pair holds exact
integer sums to 2^48 (1M rows × 2^16.1 ≈ 2^36 per pair block).  The f64
exponent combine runs outside.  Measured end-to-end relerr matches the
einsum path (~3e-15 at 1e8 dynamic range).

HBM per call drops to one read of (xsh, xsl) (~400 MB at 1M×50) plus
~8 MB of d planes — the structural bf16 slice cache is not touched (nor
needed).  Counterpart of the reference's fused dense sandwich
(``tabmat/ext/dense_helpers-tmpl.cpp:41-143``), which tiles X once
through L2 per call.
"""

from functools import partial
from typing import NamedTuple

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


class PlaneCache(NamedTuple):
    """Structural column-scaled f32 planes of X (see build_plane_cache)."""

    xsh: jax.Array  # (n_pad, k) f32, |xsh| ≤ 1
    xsl: jax.Array  # (n_pad, k) f32, xsh + xsl = X · exps⁻¹ exactly
    exps: jax.Array  # (k,) f64 per-column power-of-two scales

T7 = 7  # slice bits (matches ozaki.T7)
NP64 = 7  # planes per side for f64 inputs: 49-bit coverage each side
NP32 = 4  # planes per side for f32 inputs: 28 ≥ 24 mantissa bits
SUB = 128  # rows per MXU dot: 2^16.1-bounded products stay exact ≤ 2^23.1
NSUB = 8  # sub-tiles per grid step (one fori_loop walk)
BT = SUB * NSUB  # rows per grid step
MAX_K = 100  # NP·k ≤ 700: the (2, NP·k, NP·k) f32 pair stays ≤ ~4.3 MB VMEM

_SPLIT_C = 4097.0  # Veltkamp split constant for f32: 2^12 + 1 (python float:
# a module-level jnp scalar would be captured as a kernel constant)


def _two_prod_err(a, b, p):
    """Exact residual of the f32 product: a·b = p + err (Dekker, no FMA)."""
    t = _SPLIT_C * a
    ah = t - (t - a)
    al = a - ah
    t = _SPLIT_C * b
    bh = t - (t - b)
    bl = b - bh
    return ((ah * bh - p) + ah * bl + al * bh) + al * bl


LO_SKIP = 3  # leading vl planes identically zero, see _plane_slices_pair


def _plane_slices_pair(vh, vl, n_planes):
    """T7-bit bf16 integer slices of the exact pair value vh + vl.

    Independent telescoping f32 rounds on each plane; corresponding
    slices add exactly in bf16 (|q| ≤ ~260 ≤ 512).

    The lo component of every pair this kernel slices satisfies
    ``|vl| ≤ 3·2⁻²⁴·scale`` (f32 split residuals and the Dekker product
    tail, each ≤ 2⁻²⁴ of the ra-normalized max): its planes p < 3 round
    to exactly zero (|vl|·2²¹ ≤ 3·2⁻³ < ½), so only R₄..R_np are
    computed for it — ~25% of the kernel's VPU slicing work.
    """

    def rounds(x32):
        R = [
            jnp.round(x32 * jnp.float32(2.0 ** (p * T7)))
            for p in range(n_planes + 1)
        ]
        return [R[1]] + [
            R[p + 1] - jnp.float32(1 << T7) * R[p]
            for p in range(1, n_planes)
        ]

    def rounds_lo(x32):
        # R_p for p ≤ LO_SKIP are 0; q_{LO_SKIP} = R_{LO_SKIP+1}
        R = {
            p: jnp.round(x32 * jnp.float32(2.0 ** (p * T7)))
            for p in range(LO_SKIP + 1, n_planes + 1)
        }
        out = [R[LO_SKIP + 1]]
        out += [
            R[p + 1] - jnp.float32(1 << T7) * R[p]
            for p in range(LO_SKIP + 1, n_planes)
        ]
        return out

    qh = rounds(vh)
    if n_planes <= LO_SKIP:
        return [a.astype(jnp.bfloat16) for a in qh]
    ql = rounds_lo(vl)
    out = [a.astype(jnp.bfloat16) for a in qh[:LO_SKIP]]
    out += [
        (a + b).astype(jnp.bfloat16) for a, b in zip(qh[LO_SKIP:], ql)
    ]
    return out


def _v3_kernel(
    xh_ref, xl_ref, dh_ref, dl_ref, ra_ref, o_ref, *, k, n_planes, interpret
):
    i = pl.program_id(0)
    npk = n_planes * k
    zeros = jnp.zeros((npk, npk), jnp.float32)

    # the (2, npk, npk) out block is addressed by its 2-D leading planes —
    # rank-broadcast stores into a 3-D ref fail Mosaic's convert lowering
    @pl.when(i == 0)
    def _():
        o_ref[0] = zeros
        o_ref[1] = zeros

    # d arrives as an (n_pad, 1) column: sub-tile j's values are rows
    # [j·SUB, (j+1)·SUB) of the block, sliced exactly like the x planes.
    # (A (SUB, NSUB) pre-transposed layout fails Mosaic lowering: its
    # NSUB-lane blocks are neither 128-divisible nor the full array.)
    ra = ra_ref[:]  # (1, k) → broadcasts over (SUB, k)

    def body(j, carry):
        hi, lo = carry
        # sub-tile rows via a dynamic sublane-aligned ref slice
        xh = xh_ref[pl.ds(j * SUB, SUB), :]
        xl = xl_ref[pl.ds(j * SUB, SUB), :]
        dch = dh_ref[pl.ds(j * SUB, SUB), :]  # (SUB, 1)
        dcl = dl_ref[pl.ds(j * SUB, SUB), :]
        # exact f32-pair product y = xs·ds (then an exact power-of-two
        # column scale): |yl| ≲ 2^-23·|yh| + cross terms ≤ 2^-46
        p1 = xh * dch
        if interpret:
            # XLA (which executes interpret mode) folds the Veltkamp
            # split back to a; use an f64 residual instead (CPU only)
            perr = (
                xh.astype(jnp.float64) * dch.astype(jnp.float64)
                - p1.astype(jnp.float64)
            ).astype(jnp.float32)
        else:
            perr = _two_prod_err(xh, dch, p1)
        tail = perr + xh * dcl + xl * dch + xl * dcl
        yh = p1 * ra
        yl = tail * ra
        qa = _plane_slices_pair(yh, yl, n_planes)
        qb = _plane_slices_pair(xh, xl, n_planes)
        # ONE dot for all slice pairs: block (p, q) of the (npk, npk)
        # output is the (p, q) pair's k×k partial
        part = jax.lax.dot_general(
            jnp.concatenate(qa, axis=1),
            jnp.concatenate(qb, axis=1),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # compensated accumulation: partials are exact ≤ 2^23.1 integers,
        # the pair holds the exact running sum to 2^48
        s = hi + part
        bb = s - hi
        err = (hi - (s - bb)) + (part - bb)
        return s, lo + err

    hi, lo = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(NSUB), body, (zeros, zeros)
    )
    # fold the per-step pair into the resident pair (all integers ≤ 2^48)
    ohi = o_ref[0]
    s = ohi + hi
    bb = s - ohi
    err = (ohi - (s - bb)) + (hi - bb)
    o_ref[0] = s
    o_ref[1] = o_ref[1] + lo + err


@partial(jax.jit, static_argnames=("n_planes", "interpret"))
def _v3_parts(xsh, xsl, dh2, dl2, ra, n_planes, interpret=False):
    n_pad, k = xsh.shape
    kernel = partial(_v3_kernel, k=k, n_planes=n_planes, interpret=interpret)
    npk = n_planes * k
    return pl.pallas_call(
        kernel,
        grid=(n_pad // BT,),
        in_specs=[
            pl.BlockSpec((BT, k), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, k), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BT, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BT, 1), lambda i: (i, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, npk, npk),
            lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, npk, npk), jnp.float32),
        interpret=interpret,
    )(xsh, xsl, dh2, dl2, ra)


def build_plane_cache(X: jax.Array):
    """Structural column-scaled f32 planes of X, padded to a BT multiple.

    Returns (xsh (n_pad, k) f32, xsl (n_pad, k) f32, exps (k,) f64) with
    ``xsh + xsl = X · exps⁻¹`` exactly and ``|xsh| ≤ 1``.
    """
    n, k = X.shape
    absmax = jnp.max(jnp.abs(X), axis=0, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exps = jnp.exp2(e)[0].astype(jnp.float64)
    s = X * jnp.exp2(-e)
    xsh = s.astype(jnp.float32)
    xsl = (s - xsh.astype(jnp.float64)).astype(jnp.float32)
    n_pad = -(-n // BT) * BT
    pad = [(0, n_pad - n), (0, 0)]
    return PlaneCache(jnp.pad(xsh, pad), jnp.pad(xsl, pad), exps)


def supported(n: int, k: int, dtype) -> bool:
    from .._config import on_tpu

    if not on_tpu():
        return False
    # f32 matrices ride the single-pass f32 Pallas sandwich; this kernel
    # is the exact-f64 path
    return k <= MAX_K and jnp.dtype(dtype) == jnp.float64


def sandwich_from_cache(cache, d) -> jax.Array:
    if isinstance(cache, PackedPlaneCache):
        return sandwich_v3_packed(cache, d)
    return sandwich_v3(cache.xsh, cache.xsl, cache.exps, d)


# ---------------------------------------------------------------------------
# Packed narrow variant: for k ≪ 128 lanes the straight kernel wastes the
# VPU/MXU 128/k-fold (every (·, k) tile pads to 128 lanes).  The sandwich
# is a sum over rows, so G row-groups can sit side-by-side in the lanes:
# X (n, k) reshapes to (n/G, G·k) with packed[t, g·k+i] = X[t·G+g, i], the
# same one-pass kernel runs on the packed layout (with d expanded to match
# element-wise — no sub-tile d column any more), and the G diagonal k×k
# blocks of the (G·k, G·k) result sum to the true sandwich.  Off-diagonal
# blocks mix different original rows and are discarded.  G = MAX_K // k
# keeps the VMEM envelope of the k = MAX_K case: 3M×3 packs 33-fold.
# ---------------------------------------------------------------------------


class PackedPlaneCache(NamedTuple):
    xsh: jax.Array  # (n2_pad, G·k) f32 packed scaled planes
    xsl: jax.Array
    exps: jax.Array  # (G·k,) f64 per packed-column scales
    n: int  # original row count
    k: int  # original column count
    G: int  # row-groups per packed row


def pack_group(k: int) -> int:
    return max(1, MAX_K // k)


def estimate_cache_bytes(n: int, k: int) -> int:
    """HBM footprint of the (possibly packed) f32 pair-plane cache.

    8 bytes per packed/padded element — consulted by the global cache
    budget (``_config.cache_charge``).
    """
    G = pack_group(k)
    n2 = -(-n // G)
    n_pad = -(-n2 // SUB) * SUB
    return 8 * n_pad * G * k


def build_plane_cache_packed(X: jax.Array) -> PackedPlaneCache:
    n, k = X.shape
    G = pack_group(k)
    n2 = -(-n // G)
    Xp = jnp.pad(X, [(0, n2 * G - n), (0, 0)]).reshape(n2, G * k)
    c = build_plane_cache(Xp)
    return PackedPlaneCache(c.xsh, c.xsl, c.exps, n, k, G)


def _v3p_kernel(
    xh_ref, xl_ref, dh_ref, dl_ref, ra_ref, o_ref, *, kp, k, G, n_planes, interpret
):
    """Packed sandwich kernel with COMPACT d.

    ``dh_ref``/``dl_ref`` are (BT, G) group columns, not the (BT, G·k)
    lane-expanded planes: the expansion cost 400 MB of HBM write at prep
    plus the same again of kernel read at 1M×50 — rebuilding it in VMEM
    is G·3 VPU ops per sub-tile (lane-group select), ~100× cheaper.
    """
    i = pl.program_id(0)
    npk = n_planes * kp
    zeros = jnp.zeros((npk, npk), jnp.float32)

    @pl.when(i == 0)
    def _():
        o_ref[0] = zeros
        o_ref[1] = zeros

    ra = ra_ref[:]
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (SUB, kp), 1) // jnp.int32(k)
    group_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, G), 1)

    def expand_d(dsub):  # (SUB, G) → (SUB, G·k) lane-grouped
        acc = jnp.zeros((SUB, kp), jnp.float32)
        for g in range(G):
            colg = jnp.sum(
                dsub * (group_iota == g).astype(jnp.float32),
                axis=1,
                keepdims=True,
            )
            acc = jnp.where(lane_group == g, colg, acc)
        return acc

    def body(j, carry):
        hi, lo = carry
        xh = xh_ref[pl.ds(j * SUB, SUB), :]
        xl = xl_ref[pl.ds(j * SUB, SUB), :]
        dh = expand_d(dh_ref[pl.ds(j * SUB, SUB), :])
        dl = expand_d(dl_ref[pl.ds(j * SUB, SUB), :])
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
        qa = _plane_slices_pair(yh, yl, n_planes)
        qb = _plane_slices_pair(xh, xl, n_planes)
        part = jax.lax.dot_general(
            jnp.concatenate(qa, axis=1),
            jnp.concatenate(qb, axis=1),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = hi + part
        bb = s - hi
        err = (hi - (s - bb)) + (part - bb)
        return s, lo + err

    hi, lo = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(NSUB), body, (zeros, zeros)
    )
    ohi = o_ref[0]
    s = ohi + hi
    bb = s - ohi
    err = (ohi - (s - bb)) + (hi - bb)
    o_ref[0] = s
    o_ref[1] = o_ref[1] + lo + err


@partial(jax.jit, static_argnames=("k", "G", "n_planes", "interpret"))
def _v3p_parts(xsh, xsl, dhc, dlc, ra, k, G, n_planes, interpret=False):
    n_pad, kp = xsh.shape
    kernel = partial(
        _v3p_kernel, kp=kp, k=k, G=G, n_planes=n_planes, interpret=interpret
    )
    npk = n_planes * kp
    spec = pl.BlockSpec((BT, kp), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((BT, G), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // BT,),
        in_specs=[
            spec,
            spec,
            dspec,
            dspec,
            pl.BlockSpec((1, kp), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, npk, npk),
            lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, npk, npk), jnp.float32),
        interpret=interpret,
    )(xsh, xsl, dhc, dlc, ra)


def sandwich_v3_packed(cache: PackedPlaneCache, d, interpret=False):
    return _sandwich_v3_packed_jit(
        cache.xsh,
        cache.xsl,
        cache.exps,
        d,
        cache.n,
        cache.k,
        cache.G,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("n", "k", "G", "n_planes", "interpret"))
def _sandwich_v3_packed_jit(
    xsh, xsl, exps, d, n, k, G, n_planes=NP64, interpret=False
):
    """Exact ``X.T @ diag(d) @ X`` from the packed plane cache."""
    n_pad2, kp = xsh.shape
    d = jnp.asarray(d, dtype=jnp.float64)
    md = jnp.max(jnp.abs(d))
    eD = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(md, 1e-300))), -1000.0, 1000.0)
    ds = d * jnp.exp2(-eD)
    dsh1 = ds.astype(jnp.float32)
    dsl1 = (ds - dsh1.astype(jnp.float64)).astype(jnp.float32)
    n2 = -(-n // G)

    def compact(v):  # (n,) → (n_pad2, G) group columns
        v = jnp.pad(v, (0, n2 * G - n)).reshape(n2, G)
        return jnp.pad(v, [(0, n_pad2 - n2), (0, 0)])

    dshc = compact(dsh1)
    dslc = compact(dsl1)
    # per-packed-column max of |xs·ds| from the COMPACT d (reads xsh once;
    # the kernel rebuilds the lane expansion in VMEM — materializing the
    # (n, G·k) planes cost ~800 MB of HBM write+read per call at 1M×50)
    m = jnp.max(
        jnp.abs(xsh).reshape(n_pad2, G, k) * jnp.abs(dshc)[:, :, None],
        axis=0,
    ).reshape(kp)
    eA = jnp.ceil(
        jnp.log2(jnp.maximum(m.astype(jnp.float64), 1e-300) * (1 + 1e-5))
    )
    eA = jnp.clip(eA, -100.0, 100.0)
    ra = jnp.exp2(-eA).astype(jnp.float32).reshape(1, kp)
    parts = _v3p_parts(
        xsh, xsl, dshc, dslc, ra, k, G, n_planes, interpret=interpret
    )
    tot = parts[0].astype(jnp.float64) + parts[1].astype(jnp.float64)
    tot = tot.reshape(n_planes, kp, n_planes, kp)
    pq = jnp.arange(n_planes, dtype=jnp.float64)
    w = jnp.exp2(-(T7 * (pq[:, None] + pq[None, :] + 2.0)))
    out = jnp.einsum("piqj,pq->ij", tot, w)
    scale_a = jnp.exp2(eA) * jnp.exp2(eD) * exps
    out = out * (scale_a[:, None] * exps[None, :])
    # sum the G diagonal k×k blocks; cross blocks mix distinct rows
    out4 = out.reshape(G, k, G, k)
    gi = jnp.arange(G)
    return out4[gi, :, gi, :].sum(axis=0)


@partial(jax.jit, static_argnames=("n_planes", "interpret"))
def sandwich_v3(xsh, xsl, exps, d, n_planes=NP64, interpret=False):
    """Exact ``X.T @ diag(d) @ X`` from the structural plane cache.

    ``d`` is (n,) — shorter than the padded planes; it is zero-padded
    here (padded xs rows are zero anyway).
    """
    n_pad, k = xsh.shape
    d = jnp.asarray(d, dtype=jnp.float64)
    n = d.shape[0]
    # exact global power-of-two scale of d keeps its f32 planes finite
    md = jnp.max(jnp.abs(d))
    eD = jnp.ceil(jnp.log2(jnp.maximum(md, 1e-300)))
    eD = jnp.clip(eD, -1000.0, 1000.0)
    ds = d * jnp.exp2(-eD)
    dsh = jnp.pad(ds.astype(jnp.float32), (0, n_pad - n))
    dsl = jnp.pad(
        (ds - dsh[:n].astype(jnp.float64)).astype(jnp.float32),
        (0, n_pad - n),
    )
    # per-column A-side exponent from a cheap f32 pass; the (1 + 1e-5)
    # margin makes the f32 estimate an upper bound of the true max (f32
    # relerr < 2^-23), so scaled values stay ≤ 1.  The clip bounds the
    # f32 scale: columns whose |xs·ds| max is below ~2^-100 of the global
    # scale flush to an absolute-error floor of ~2^(eB+eD-149) — far
    # below f64 relevance for any non-degenerate design.
    m = jnp.max(jnp.abs(xsh) * jnp.abs(dsh)[:, None], axis=0)
    eA = jnp.ceil(
        jnp.log2(jnp.maximum(m.astype(jnp.float64), 1e-300) * (1 + 1e-5))
    )
    eA = jnp.clip(eA, -100.0, 100.0)
    ra = jnp.exp2(-eA).astype(jnp.float32).reshape(1, k)
    parts = _v3_parts(
        xsh,
        xsl,
        dsh[:, None],
        dsl[:, None],
        ra,
        n_planes,
        interpret=interpret,
    )
    tot = parts[0].astype(jnp.float64) + parts[1].astype(jnp.float64)
    tot = tot.reshape(n_planes, k, n_planes, k)
    pq = jnp.arange(n_planes, dtype=jnp.float64)
    w = jnp.exp2(-(T7 * (pq[:, None] + pq[None, :] + 2.0)))
    out = jnp.einsum("piqj,pq->ij", tot, w)
    scale_a = jnp.exp2(eA) * jnp.exp2(eD) * exps
    return out * (scale_a[:, None] * exps[None, :])
