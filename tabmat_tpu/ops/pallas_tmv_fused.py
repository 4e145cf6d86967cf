"""Fused sparse transpose-matvec: ONE Pallas pass for ``X.T @ v`` (CSR).

Round-4's route ran the same math as three device programs — windowed
``v[row]`` take (``pallas_window_take``), an XLA multiply, and the one-hot
MXU segment-sum (``pallas_segsum``) fed by a multi-pass Ozaki slicing of
the products.  Each hop round-trips an nnz-length intermediate through HBM
and pays a dispatch; at 400k nnz the sequence floors near ~2 ms while the
reference's serial CSC walk (``tabmat/ext/sparse.pyx:142-199``) does the
whole thing in one L2-resident pass.  This kernel is the TPU shape of that
one-pass walk:

per (BR, 128) tile of nnz in CSR (row-major, so row ids are MONOTONE):

1. **windowed gather** ``g = v[row]`` — the table is NOT held resident in
   VMEM (the round-4 kernel's ~1.2M-entry cap): the tile's table window is
   DMA'd by Pallas itself via two scalar-prefetch-indexed ``(W, 128)``
   blocks (start row is prefetched per tile, so ``index_map`` can address
   it), which unbounds the source length — ``sparse_narrow``'s 3M-entry
   target vector included;
2. **pair product** ``vals = data · g`` in exact float-float arithmetic
   (Dekker two-prod on the platform's native (hi, lo) f32 planes — no f64
   refs exist on TPU);
3. **per-tile integer slicing** of the value pair (T7-bit levels via the
   independent-f32-rounds identity of ``ozaki.slice_vector_f32planes``,
   with a per-tile power-of-two scale from exponent bit-twiddles — no
   transcendentals, no global max prepass);
4. **one-hot MXU reduction** over the tile's column codes: ``(S, SB·128)
   slice rows × (SB·128, Kpad) one-hot`` dots, integer-exact in f32.

Outputs are per-tile integer partials ``(T, S, Kpad)`` plus per-tile
exponents; the cross-tile combine is a ~KB-sized exact f64 einsum that XLA
fuses into the surrounding program.  Tile height BR adapts to the design's
nnz-per-row so the gather's window stays shallow (the round-4 kernel's
fixed BR=256 paid W≈320 passes/tile on the 400k×100 design; BR=64 pays
~96 for 4× less VPU work per code).

Column cap: Kpad ≤ 512 (one-hot VMEM); wider matrices keep the bucketed
segment-sum route.  Exactness: each tile's slices cover 49 bits below the
tile's own max |value| — at least the platform pair's 48 — and every
reduction is integer-exact until the final f64 combine.
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np

from .pallas_gather import _lane_gather

LANE = 128
T7 = 7  # slice width (bits); |q| ≤ ~130 per level, exact in bf16
S_F64 = 7  # 49 bits ≥ the platform pair's 48
S_F32 = 5  # 35 bits ≥ f32's 24 plus product-residual headroom
MAX_W = 512  # table-window rows per tile (two (W,128) f32 blocks ≤ 512 KB)
MAX_KPAD = 512  # one-hot lane width cap
MAX_GRID = 8192  # tiles per call (keeps wsb/r0 prefetch arrays tiny)
_ONEHOT_VMEM = 1 << 21  # ≤ 2 MB one-hot per sub-block


class FusedTmvPlan:
    """Host-side structural plan for the fused transpose-matvec.

    Built once per (matrix, CSR layout); device uploads of the code /
    window arrays are cached by the owning matrix.  ``None``-able:
    :func:`build_plan` rejects layouts the kernel does not cover (wide k,
    tiles spanning too many table rows even at the smallest tile height).
    """

    __slots__ = (
        "codes2d", "ccodes2d", "wsb", "r0", "BR", "W", "SB",
        "kpad", "n", "k", "nnz", "nblk",
    )

    def __init__(self, codes2d, ccodes2d, wsb, r0, BR, W, SB, kpad, n, k, nnz, nblk):
        self.codes2d = codes2d
        self.ccodes2d = ccodes2d
        self.wsb = wsb
        self.r0 = r0
        self.BR = BR
        self.W = W
        self.SB = SB
        self.kpad = kpad
        self.n = n
        self.k = k
        self.nnz = nnz
        self.nblk = nblk


def build_plan(row_ids: np.ndarray, col_ids: np.ndarray, n: int, k: int):
    """Plan the fused tmv for a CSR-ordered nnz layout.

    ``row_ids`` must be non-decreasing (CSR row-major order).  Picks the
    tile height BR ∈ {8..256} minimizing estimated gather work
    (grid · W · BR) subject to the window cap, then lays out codes,
    per-tile window-block starts and in-window offsets.
    """
    nnz = int(len(row_ids))
    if nnz == 0 or k > MAX_KPAD or n <= 0:
        return None
    row_ids = np.asarray(row_ids)
    col_ids = np.asarray(col_ids)
    if row_ids[0] < 0 or np.any(np.diff(row_ids) < 0):
        return None
    if n >= (1 << 31) or nnz >= (1 << 31):
        return None

    kpad = max(-(-k // LANE) * LANE, LANE)
    hi_all = row_ids.astype(np.int64) >> 7

    best = None
    for BR in (8, 16, 32, 64, 128, 256):
        tile = BR * LANE
        tiles = -(-nnz // tile)
        if tiles > MAX_GRID:
            continue
        # per-tile span of table rows (padding repeats the last id)
        pad = tiles * tile - nnz
        hi = np.concatenate([hi_all, np.full(pad, hi_all[-1], dtype=np.int64)])
        th = hi.reshape(tiles, tile)
        ws = th.min(axis=1)
        span = int((th.max(axis=1) - ws).max()) + 1
        # quantize W for jit-key stability across data realizations
        W = min(-(-(span + 4) // 32) * 32, MAX_W)
        if span > W:
            continue
        cost = tiles * (W * BR * LANE + 6000 * LANE)  # gather work + step overhead
        if best is None or cost < best[0]:
            best = (cost, BR, W, tiles, ws)
    if best is None:
        return None
    _, BR, W, tiles, ws = best

    rows_pad = tiles * BR
    flat_r = np.full(rows_pad * LANE, int(row_ids[-1]), dtype=np.int32)
    flat_r[:nnz] = row_ids.astype(np.int32, copy=False)
    codes2d = flat_r.reshape(rows_pad, LANE)
    flat_c = np.full(rows_pad * LANE, -1, dtype=np.int32)
    flat_c[:nnz] = col_ids.astype(np.int32, copy=False)
    ccodes2d = flat_c.reshape(rows_pad, LANE)

    wsb = (ws // W).astype(np.int32)
    r0 = (ws - wsb.astype(np.int64) * W).astype(np.int32)
    C = -(-n // LANE)
    nblk = max(int(wsb.max()) + 2, -(-C // W) + 1)

    SB = max(8, min(BR, _ONEHOT_VMEM // (LANE * kpad * 2)))
    while BR % SB:
        SB //= 2
    return FusedTmvPlan(
        codes2d, ccodes2d, wsb, r0, BR, W, SB, kpad, int(n), int(k), nnz, nblk
    )


def _two_prod(a, b):
    """Exact f32 product ``a·b = p + e`` (Dekker split; no FMA assumed)."""
    p = a * b
    c = jnp.float32(4097.0)  # 2^12 + 1 splitter for 24-bit mantissas
    ah = a * c - (a * c - a)
    al = a - ah
    bh = b * c - (b * c - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _plane_slices(x32, S):
    """T7-bit integer levels of a scaled (|x| ≲ 1) f32 plane.

    Independent-rounds telescope (``ozaki.slice_vector_f32planes``):
    exact in pure f32 because every ``x·2^{pT}`` is a power-of-two scale.
    """
    R = [jnp.round(x32 * jnp.float32(2.0 ** ((p + 1) * T7))) for p in range(S)]
    return [R[0]] + [R[p] - jnp.float32(1 << T7) * R[p - 1] for p in range(1, S)]


def _kernel(wsb_ref, r0_ref, thA, thB, tlA, tlB, dh_ref, dl_ref, rc_ref, cc_ref,
            parts_ref, exp_ref, sh_ref, sl_ref, *, W, BR, SB, KP, S,
            stage="full"):
    # ``stage`` is a hardware-profiling knob (docs/probes/r5_fused_tmv_probe):
    # "nogather" skips the window-gather loop, "noonehot" replaces the
    # one-hot build+dots with a slice — each isolates one stage's cost.
    i = pl.program_id(0)
    # table window: two W-aligned blocks stitched into a (2W, 128) scratch
    sh_ref[0:W] = thA[:]
    sh_ref[W:2 * W] = thB[:]
    sl_ref[0:W] = tlA[:]
    sl_ref[W:2 * W] = tlB[:]

    codes = rc_ref[:]
    hi = codes >> 7
    lo = codes & (LANE - 1)
    base = wsb_ref[i] * jnp.int32(W) + r0_ref[i]  # absolute first table row
    rel0 = r0_ref[i]

    def body(t, accs):
        a0, a1 = accs
        keep = hi == (base + t)
        r0h = jnp.broadcast_to(sh_ref[pl.ds(rel0 + t, 1), :], (BR, LANE))
        r0l = jnp.broadcast_to(sl_ref[pl.ds(rel0 + t, 1), :], (BR, LANE))
        a0 = jnp.where(keep, _lane_gather(r0h, lo), a0)
        a1 = jnp.where(keep, _lane_gather(r0l, lo), a1)
        return a0, a1

    z = jnp.zeros((BR, LANE), jnp.float32)
    if stage == "nogather":
        gh, gl = sh_ref[0:BR] * jnp.float32(lo.astype(jnp.float32)[0, 0]), z
    else:
        gh, gl = jax.lax.fori_loop(jnp.int32(0), jnp.int32(W), body, (z, z))

    # vals = data · g as an exact-enough float-float pair:
    # two_prod(dh, gh) is exact; the three cross terms carry ≤ 2^-24
    # relative weight so their own f32 roundings land below 2^-48
    dh = dh_ref[:]
    dl = dl_ref[:]
    ph, pe = _two_prod(dh, gh)
    plo = pe + (dh * gl + dl * gh) + dl * gl
    # renormalize so the lo plane sits fully below the hi plane's mantissa
    vh = ph + plo
    vl = plo - (vh - ph)

    # per-tile power-of-two scale from exponent bits (no transcendentals):
    # m = 1.f·2^j → e = j+1, so |vh|·2^-e < 1
    m = jnp.max(jnp.abs(vh))
    m = jnp.maximum(m, jnp.float32(1e-30)).reshape(1, 1)
    e_i = (pltpu.bitcast(m, jnp.int32) >> 23) - jnp.int32(126)  # (1, 1)
    inv = pltpu.bitcast((jnp.int32(127) - e_i) << 23, jnp.float32)
    xh = vh * inv
    xl = vl * inv

    qh = _plane_slices(xh, S)
    ql = _plane_slices(xl, S)
    q = jnp.stack([(a + b) for a, b in zip(qh, ql)]).astype(jnp.bfloat16)

    # one-hot MXU reduction over column codes, SB sublanes at a time.
    # Mosaic cannot lower a two-dim contraction, but it CAN merge
    # (SB, LANE) into one lane axis on both sides — so each sub-block is
    # a plain (S, SB·LANE) @ (SB·LANE, KP) matmul (hardware-validated).
    cc = cc_ref[:]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (SB, LANE, KP), 2)
    acc = jnp.zeros((S, KP), jnp.float32)
    for sb in range(BR // SB):
        c_sub = cc[sb * SB:(sb + 1) * SB, :]
        q_sub = q[:, sb * SB:(sb + 1) * SB, :]
        if stage == "noonehot":
            acc = acc + q_sub.reshape(S, SB * LANE)[:, :KP].astype(jnp.float32)
            acc = acc + jnp.float32(c_sub[0, 0])
            continue
        oh = (c_sub[:, :, None] == iota_k).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            q_sub.reshape(S, SB * LANE), oh.reshape(SB * LANE, KP),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    parts_ref[0] = acc
    # (1, 8, LANE) block: Mosaic needs (8, 128)-tileable output blocks, so
    # the scalar per-tile exponent is broadcast into a padded row
    exp_ref[0] = jnp.broadcast_to(e_i[0, 0].astype(jnp.float32), (8, LANE))


@partial(jax.jit, static_argnames=("W", "BR", "SB", "KP", "S", "nblk",
                                   "interpret", "stage"))
def _fused_parts(vh, vl, dh2d, dl2d, codes2d, ccodes2d, wsb, r0,
                 W, BR, SB, KP, S, nblk, interpret=False, stage="full"):
    """Run the fused kernel → ((T, S, KP) f32 partials, (T, 1) f32 exps)."""
    # pad the table planes to nblk whole (W, 128) blocks
    need = nblk * W * LANE
    vh = jnp.pad(vh, (0, need - vh.shape[0])).reshape(nblk * W, LANE)
    vl = jnp.pad(vl, (0, need - vl.shape[0])).reshape(nblk * W, LANE)
    R = codes2d.shape[0]
    T = R // BR
    parts, exps = pl.pallas_call(
        partial(_kernel, W=W, BR=BR, SB=SB, KP=KP, S=S, stage=stage),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((W, LANE), lambda i, wsb, r0: (wsb[i], jnp.int32(0))),
                pl.BlockSpec((W, LANE), lambda i, wsb, r0: (wsb[i] + 1, jnp.int32(0))),
                pl.BlockSpec((W, LANE), lambda i, wsb, r0: (wsb[i], jnp.int32(0))),
                pl.BlockSpec((W, LANE), lambda i, wsb, r0: (wsb[i] + 1, jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, wsb, r0: (i, jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, wsb, r0: (i, jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, wsb, r0: (i, jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, wsb, r0: (i, jnp.int32(0))),
            ],
            out_specs=[
                pl.BlockSpec((1, S, KP), lambda i, wsb, r0: (i, jnp.int32(0), jnp.int32(0))),
                pl.BlockSpec(
                    (1, 8, LANE),
                    lambda i, wsb, r0: (i, jnp.int32(0), jnp.int32(0)),
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2 * W, LANE), jnp.float32),
                pltpu.VMEM((2 * W, LANE), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, S, KP), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(wsb, r0, vh, vh, vl, vl, dh2d, dl2d, codes2d, ccodes2d)
    return parts, exps


@partial(jax.jit, static_argnames=("W", "BR", "SB", "KP", "S", "nblk", "k", "out_f64", "interpret"))
def fused_tmv(v, dh2d, dl2d, codes2d, ccodes2d, wsb, r0,
              W, BR, SB, KP, S, nblk, k, out_f64=True, interpret=False):
    """``X.T @ v`` from cached plan uploads + the raw f64/f32 vector → (k,).

    The v plane split happens INSIDE the jit: the whole op is one
    dispatch from Python (per-link host overhead dominates sub-ms device
    kernels under the chained-marginal protocol).  The cross-tile combine
    is exact: per-tile partials are ≤2^22 f32 integers, weighted in f64
    by the slice levels and the tile's power-of-two scale.
    """
    vh, vl = split_planes(v)
    parts, exps = _fused_parts(
        vh, vl, dh2d, dl2d, codes2d, ccodes2d, wsb, r0,
        W, BR, SB, KP, S, nblk, interpret,
    )
    w = jnp.asarray([0.5 ** ((p + 1) * T7) for p in range(S)], dtype=jnp.float64)
    scales = jnp.exp2(exps[:, 0, 0].astype(jnp.float64))
    out = jnp.einsum(
        "tsk,s,t->k", parts.astype(jnp.float64), w, scales, precision="highest"
    )
    out = out[:k]
    return out if out_f64 else out.astype(jnp.float32)


def split_planes(x):
    """f64/f32 vector → native (hi, lo) f32 planes (lo = 0 for f32)."""
    if x.dtype == jnp.float64:
        h = x.astype(jnp.float32)
        return h, (x - h.astype(jnp.float64)).astype(jnp.float32)
    return x.astype(jnp.float32), jnp.zeros_like(x, dtype=jnp.float32)


def supported(dtype) -> bool:
    import os

    from .._config import on_tpu

    if not on_tpu():
        return False
    # TEMPORARY opt-in gate: flipped to default-on (kill-switch only)
    # after the round-5 hardware validation run
    if os.environ.get("TABMAT_TPU_FUSED_TMV", "0") != "1":
        return False
    if os.environ.get("TABMAT_TPU_NO_FUSED_TMV", "0") == "1":
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.float64)
