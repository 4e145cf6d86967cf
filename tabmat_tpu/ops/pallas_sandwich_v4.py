"""Anti-diagonal int8 dense sandwich: X.T @ diag(d) @ X at the int8 MXU rate.

Successor of the v3 one-pass kernel (``pallas_sandwich_v3.py``).  Probing
v3 on hardware showed its cost is NOT the VPU slice extraction (~2.4 ms
of 19 ms at 1M×50) but (a) the single wide bf16 dot, whose (128, np·k)
operands pay a lane-misaligned concatenation relayout and whose
(np·k, np·k) output leaves the MXU at ~30% utilization, and (b) the
per-sub-tile compensated TwoSum accumulation over the (np·k)² f32 pair
(~6 VPU passes over 490k lanes every 128 rows).

v4 removes all three costs with one structural observation: the Ozaki
plane weights depend only on the anti-diagonal ``s = p + q``, so the 64
slice-pair products never need to be kept apart — only their
anti-diagonal sums do.  Stacking the A-side planes ascending and the
B-side planes descending along the CONTRACTION (sublane) axis makes
each anti-diagonal sum a single dot over a contiguous window:

    C_s = Σ_{p+q=s} Qa_pᵀ Qb_q
        = Astack[p0·B : (p0+cnt)·B]ᵀ · Bstack[q0·B : (q0+cnt)·B]

with ``Astack[p·B:(p+1)·B] = Qa_p`` and ``Bstack[(NP-1-q)·B:…] = Qb_q``.

Two further structural facts (validated by on-chip variant probes at
1M×50: slicing/stores ≈ 9.3 ms of 16.8 ms, dots ≈ 7.5 ms with ~40%
per-dot overhead):

- The B-side slices depend only on X, never on ``d`` — so the cache
  precomputes the full descending B-stack once (int8, ~1 byte/element
  per plane) in a step-interleaved HBM layout, and the kernel slices
  only the d-folded A side.  Halves the in-kernel VPU work for one
  extra int8 HBM stream.
- Anti-diagonals with ``s ≥ S_MAX = 10`` carry absolute weight
  ≤ 2⁻⁷² (≤ 2⁻⁶⁰ relative to the s=0 leading anti-diagonal's 2⁻¹²)
  and are skipped (dropped contribution ~2⁻⁵⁸ ≪ 1 ulp of f64;
  measured 4e-15).

Per B-row grid step the kernel therefore issues S_MAX int8 MXU dots
with long contractions (up to 8·SUB rows) and ONE output-stationary
(kpad, kpad) int32 tile each — no lane concat, no output tiling walk —
and accumulation is a plain int32 add.  T6 slices keep the pair-combined
slice magnitude ≤ 65 (= 2^5+½ per component), so products are ≤ 4225
and the int32 accumulators hold ≳ 2^18.9 rows exactly; they flush into
compensated f32 pairs every FLUSH_EVERY grid steps (exact: the int32
splits as hi·2^12 + lo with both halves f32-exact).

Numerics match v3: both operands are column-scaled f32 pairs
(hi + lo = X·2^-e exactly), the d-side product uses a Dekker two-product
(no FMA on the VPU), 8 T6 planes cover 48 bits per side, and every
arithmetic step until the final f64 combine is error-free.  Measured
end-to-end relerr ~4e-15 at 1e8 dynamic range (same as v3).

Counterpart of the reference's fused dense sandwich
(``tabmat/ext/dense_helpers-tmpl.cpp:41-143``), which reads X once per
call through the L2-tiled k-loop.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T6 = 6  # slice bits: pair-combined slice magnitude ≤ 2^5 + 1 ≤ 65 (int8)
NP = 8  # planes per side: 48-bit coverage of the f32-pair operand
S_MAX = 10  # anti-diagonals kept; s ≥ 10 weigh ≤ 2^-72 absolute (2^-60 rel. to s=0)
LO_SKIP = 3  # |lo| ≤ 3·2^-24 ⇒ its planes p < 3 round to exactly 0
SUB = 2048  # rows per grid step (amortizes per-dot/per-pass overhead)
LANE = 128
MAX_KP = 128  # one lane tile per plane this version; k ≤ 128 after packing
_SPLIT_C = 4097.0  # Veltkamp split constant for f32 (2^12 + 1)

# worst-case |slice| ≤ 65 ⇒ products ≤ 4225; int32 holds 2^31/4225 rows
# exactly; with the widest anti-diagonal summing NP windows per step the
# flush period is 2^31 / (4225 · NP · SUB) ≈ 31 grid steps.
FLUSH_EVERY = 16


class PlaneCacheV4(NamedTuple):
    """Structural caches: f32 pair planes of packed X + int8 B-stack."""

    xsh: jax.Array  # (n_pad, kpad) f32, |xsh| ≤ 1, zero pad rows/lanes
    xsl: jax.Array  # (n_pad, kpad) f32, xsh + xsl = Xp · exps⁻¹ exactly
    bstk: jax.Array  # (n_steps·NP·SUB, kpad) int8 — per-step descending
    #                  plane stack: rows [t·NP·SUB + j·SUB + r] hold plane
    #                  NP-1-j of X rows [t·SUB + r] (kernel reads one block)
    exps: jax.Array  # (kpad,) f64 per-column powers of two (1 in pads)
    n: int  # original row count
    k: int  # original column count
    G: int  # row-groups packed per padded row


def _two_prod_err(a, b, p):
    """Exact residual of the f32 product: a·b = p + err (Dekker, no FMA)."""
    t = _SPLIT_C * a
    ah = t - (t - a)
    al = a - ah
    t = _SPLIT_C * b
    bh = t - (t - b)
    bl = b - bh
    return ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _plane_slices_pair(vh, vl, interpret):
    """T6-bit int8 slices of the exact pair value vh + vl (NP planes).

    Telescoping f32 rounds on each component; corresponding slices add
    exactly (|q_hi| + |q_lo| ≤ 65 ≪ f32/int8 exact range).  The lo
    component's first LO_SKIP planes are identically zero and skipped.
    """

    def rounds(x32):
        R = [
            jnp.round(x32 * jnp.float32(2.0 ** (p * T6)))
            for p in range(NP + 1)
        ]
        return [R[1]] + [
            R[p + 1] - jnp.float32(1 << T6) * R[p] for p in range(1, NP)
        ]

    def rounds_lo(x32):
        R = {
            p: jnp.round(x32 * jnp.float32(2.0 ** (p * T6)))
            for p in range(LO_SKIP + 1, NP + 1)
        }
        out = [R[LO_SKIP + 1]]
        out += [
            R[p + 1] - jnp.float32(1 << T6) * R[p]
            for p in range(LO_SKIP + 1, NP)
        ]
        return out

    qh = rounds(vh)
    ql = rounds_lo(vl)
    out = [a for a in qh[:LO_SKIP]]
    out += [a + b for a, b in zip(qh[LO_SKIP:], ql)]
    return [a.astype(jnp.int8) for a in out]


def _v4_kernel(
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
    G,
    n_steps,
    interpret,
):
    t = pl.program_id(0)
    zpair = jnp.zeros((kpad, kpad), jnp.float32)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for s in range(S_MAX):
            o_ref[s] = zpair
            o_ref[S_MAX + s] = zpair

    ra = ra_ref[:]  # (1, kpad)
    xh = xh_ref[:]
    xl = xl_ref[:]

    # rebuild the lane-expanded d from the transposed (G8, SUB) group
    # rows with one tiny MXU dot per operand: dh = dsubᵀ-contracted
    # gsel, where gsel[g, c] = 1 iff lane c belongs to group g.  The
    # transposed layout keeps the d operands sublane-padded only
    # (G8 = G rounded up to 8) — the earlier (SUB, G) group columns
    # lane-padded G → 128, a 64× HBM blowup on the d stream.  Pad lanes
    # c ≥ G·k map to pad rows g ≥ G, which are zero → dh = 0 there.
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
            # HIGHEST = split-operand bf16 passes; exact for this
            # one-hot contraction (the bf16 splits of an f32 value have
            # disjoint mantissas, so the pass sum recombines exactly —
            # default single-pass bf16 rounds dh to 8 mantissa bits:
            # measured relerr 7e-6 on hardware)
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

    # A ascending along sublanes; B's descending stack is precomputed in
    # the cache, so anti-diagonal s is one contiguous-window dot on both
    # sides (see module docstring)
    for p in range(NP):
        astk_ref[pl.ds(p * SUB, SUB), :] = qa[p]

    for s in range(S_MAX):
        p0 = max(0, s - (NP - 1))
        cnt = min(s, NP - 1) - p0 + 1
        q0hi = NP - 1 - (s - p0)  # stack row-block of B's first window
        part = jax.lax.dot_general(
            astk_ref[pl.ds(p0 * SUB, cnt * SUB), :],
            bstk_ref[pl.ds(q0hi * SUB, cnt * SUB), :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[s] = acc_ref[s] + part

    # exact flush of the int32 accumulators into compensated f32 pairs
    # int32-pinned modulo: python-int promotion leaks an i64 convert that
    # recurses in Mosaic's convert lowering under x64
    t32 = t.astype(jnp.int32)
    is_flush = (t32 + jnp.int32(1)) % jnp.int32(FLUSH_EVERY) == jnp.int32(0)

    @pl.when(jnp.logical_or(is_flush, t32 == jnp.int32(n_steps - 1)))
    def _():
        for s in range(S_MAX):
            acc = acc_ref[s]
            high = jax.lax.shift_right_arithmetic(acc, jnp.int32(12))
            low = acc - jax.lax.shift_left(high, jnp.int32(12))
            th = high.astype(jnp.float32) * jnp.float32(4096.0)
            tl = low.astype(jnp.float32)
            hi0 = o_ref[s]
            lo0 = o_ref[S_MAX + s]
            # two error-free TwoSum steps into the (hi, lo) running pair
            s1 = hi0 + th
            bb = s1 - hi0
            lo0 = lo0 + ((hi0 - (s1 - bb)) + (th - bb))
            s2 = s1 + tl
            bb = s2 - s1
            lo0 = lo0 + ((s1 - (s2 - bb)) + (tl - bb))
            o_ref[s] = s2
            o_ref[S_MAX + s] = lo0
            acc_ref[s] = jnp.zeros_like(acc)


@partial(jax.jit, static_argnames=("k", "G", "interpret"))
def _v4_parts(xsh, xsl, dhc, dlc, ra, bstk, k, G, interpret=False):
    n_pad, kpad = xsh.shape
    n_steps = n_pad // SUB
    G8 = dhc.shape[0]
    kernel = partial(
        _v4_kernel,
        kpad=kpad,
        k=k,
        G=G,
        n_steps=n_steps,
        interpret=interpret,
    )
    spec = pl.BlockSpec((SUB, kpad), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((G8, SUB), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec(
        (NP * SUB, kpad), lambda i: (i, i * 0), memory_space=pltpu.VMEM
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
            (2 * S_MAX, kpad, kpad),
            lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2 * S_MAX, kpad, kpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NP * SUB, kpad), jnp.int8),
            pltpu.VMEM((S_MAX, kpad, kpad), jnp.int32),
        ],
        # A-stack + accumulators + double-buffered operands ≈ 14 MB at
        # kpad=128, SUB=2048, but Mosaic's stack accounting for the wide
        # d-fold (G up to 64 group columns) peaks at ~66 MB — budget 100
        # of the 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xsh, xsl, dhc, dlc, ra, bstk)


def pack_group(k: int) -> int:
    return max(1, MAX_KP // k)


def estimate_cache_bytes(n: int, k: int) -> int:
    """HBM footprint of :func:`build_plane_cache` before building it.

    f32 pair planes (8 B) plus the NP-plane int8 B-stack (NP B) on the
    packed/padded layout — consulted by the global cache budget
    (``_config.cache_charge``).
    """
    G = pack_group(k)
    kpad = -(-(G * k) // LANE) * LANE
    n2 = -(-n // G)
    n_pad = -(-n2 // SUB) * SUB
    return (8 + NP) * n_pad * kpad


@partial(jax.jit, static_argnames=("interpret",))
def _build_bstk(xsh, xsl, interpret=False):
    """Step-interleaved descending int8 plane stack of the B side.

    Output rows [t·NP·SUB + j·SUB + r] hold plane NP-1-j of packed row
    t·SUB + r, so each grid step reads ONE contiguous (NP·SUB, kpad)
    block covering all planes of its row slab.
    """
    n_pad, kpad = xsh.shape
    n_steps = n_pad // SUB
    qb = _plane_slices_pair(xsh, xsl, interpret)  # NP × (n_pad, kpad)
    stk = jnp.stack(qb[::-1], axis=0)  # (NP, n_pad, kpad), descending
    stk = stk.reshape(NP, n_steps, SUB, kpad).transpose(1, 0, 2, 3)
    return stk.reshape(n_steps * NP * SUB, kpad)


def build_plane_cache(X: jax.Array, row_multiple: int = SUB) -> PlaneCacheV4:
    """Structural column-scaled packed f32 planes + int8 B-stack.

    Row-groups sit side by side in the lanes (the sandwich is a row
    reduction, so the G diagonal k×k blocks of the packed result sum to
    the true sandwich); pad lanes and pad rows are zero.

    ``row_multiple`` rounds the padded row count up to a multiple of
    that many rows (≥ SUB); pass ``SUB * n_shards`` to make the cache
    row-shardable for ``parallel.shard_ops.sharded_plane_sandwich``.
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
    exps = jnp.pad(jnp.exp2(e)[0].astype(jnp.float64), (0, kpad - kp), constant_values=1.0)
    s = Xp * jnp.exp2(-e)
    xsh = s.astype(jnp.float32)
    xsl = (s - xsh.astype(jnp.float64)).astype(jnp.float32)
    pad = [(0, n_pad - n2), (0, kpad - kp)]
    xsh = jnp.pad(xsh, pad)
    xsl = jnp.pad(xsl, pad)
    bstk = _build_bstk(xsh, xsl)
    return PlaneCacheV4(xsh, xsl, bstk, exps, n, k, G)


def supported(n: int, k: int, dtype) -> bool:
    from .._config import on_tpu

    if not on_tpu():
        return False
    return k <= MAX_KP and jnp.dtype(dtype) == jnp.float64


def sandwich_from_cache(cache: PlaneCacheV4, d) -> jax.Array:
    return _sandwich_v4_jit(
        cache.xsh,
        cache.xsl,
        cache.bstk,
        cache.exps,
        d,
        cache.n,
        cache.k,
        cache.G,
    )


def _v4_prep(xsh, d, n, k, G, pallas_max=True, interpret=False):
    """d-side transposed group rows + per-column A-exponent bound.

    Returns ``(dhc, dlc, ra, eA, eD)`` with ``dhc``/``dlc`` of shape
    ``(G8, n_pad)`` (groups in sublanes, padded to 8 — lane-major rows
    keep the d stream at ~n·4 bytes instead of the 64×-padded
    ``(n_pad, G)`` columns).  ``pallas_max=True`` computes the exact
    per-column |x·d| max with a bandwidth-bound Pallas prepass;
    ``pallas_max=False`` keeps a pure-jnp formulation (GSPMD-legal on
    row-sharded ``xsh`` — used by ``parallel.shard_ops``).
    """
    n_pad, kpad = xsh.shape
    kp = G * k
    d = jnp.asarray(d, dtype=jnp.float64)
    # Fast path (the common one — |d| comfortably inside f32 range):
    # split first, scale second.  The only emulated-f64 pass over the n
    # elements is the pair-split subtract; the 2^-eD scale is a power of
    # two applied to each f32 half separately, which stays exact
    # (dsh1 + dsl1 = d·2^-eD).  The f32 max bounds |d| to within 2^-24,
    # covered by the (1 + 1e-5) margin.  Elements denormal in f32 sit
    # ≥ 48 bits below the max (gate: max ≥ 2^-100) — below the slice
    # coverage, so their pair truncation is invisible.
    # Slow path (overflow/underflow/NaN): scale in f64, then split —
    # three emulated passes, full f64 range.
    dh1 = d.astype(jnp.float32)
    m1 = jnp.max(jnp.abs(dh1))
    ok = jnp.isfinite(m1) & (m1 >= jnp.float32(2.0**-100))

    def _fast(d):
        dl1 = (d - dh1.astype(jnp.float64)).astype(jnp.float32)
        eD = jnp.ceil(
            jnp.log2(m1.astype(jnp.float64) * (1 + 1e-5))
        )
        sD = jnp.exp2(-eD).astype(jnp.float32)
        return dh1 * sD, dl1 * sD, eD

    def _slow(d):
        md = jnp.max(jnp.abs(d))
        eD = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(md, 1e-300))), -1000.0, 1000.0
        )
        ds = d * jnp.exp2(-eD)
        a = ds.astype(jnp.float32)
        return a, (ds - a.astype(jnp.float64)).astype(jnp.float32), eD

    dsh1, dsl1, eD = jax.lax.cond(ok, _fast, _slow, d)
    n2 = -(-n // G)
    G8 = -(-G // 8) * 8

    def compact_T(v):  # (n,) → (G8, n_pad) transposed group rows
        v = jnp.pad(v, (0, n2 * G - n))
        rows = [
            jax.lax.slice(v, (g,), (n2 * G,), (G,)) for g in range(G)
        ]  # 1-D strided slices stay lane-major
        out = jnp.stack(rows, axis=0)  # (G, n2)
        return jnp.pad(out, [(0, G8 - G), (0, n_pad - n2)])

    dhc = compact_T(dsh1)
    dlc = compact_T(dsl1)
    # exact per-column max of |x_scaled|·|d_scaled| → eA bound (the
    # (1 + 1e-5) margin dominates the f32 relerr, so scaled values ≤ 1;
    # pad lanes hit the 1e-300 floor and scale to zero harmlessly)
    if pallas_max:
        m8 = _max_prepass(xsh, jnp.abs(dhc), k, G, interpret=interpret)
        m = jnp.max(m8, axis=0)[:kp]
    else:
        # jnp fallback: (n_pad, G) group columns + stride-0 lane
        # broadcasts fuse into one pass over xsh.  Pays the lane-padded
        # d columns, but is GSPMD-partitionable on row-sharded xsh —
        # the sharded sandwich (parallel/shard_ops) uses this form.
        vg = jnp.pad(dsh1, (0, n2 * G - n)).reshape(n2, G)
        vg = jnp.pad(vg, [(0, n_pad - n2), (0, 0)])
        kpad_i = xsh.shape[1]
        lane_g = jax.lax.iota(jnp.int32, kpad_i)[None, :] // jnp.int32(k)
        dexp_abs = jnp.zeros((n_pad, kpad_i), dtype=jnp.float32)
        for g in range(G):
            dexp_abs = jnp.where(
                lane_g == g, jnp.abs(vg[:, g : g + 1]), dexp_abs
            )
        m = jnp.max(jnp.abs(xsh) * dexp_abs, axis=0)[:kp]
    eA = jnp.ceil(
        jnp.log2(jnp.maximum(m.astype(jnp.float64), 1e-300) * (1 + 1e-5))
    )
    eA = jnp.clip(eA, -100.0, 100.0)
    ra = jnp.pad(
        jnp.exp2(-eA).astype(jnp.float32), (0, kpad - kp)
    ).reshape(1, kpad)
    return dhc, dlc, ra, eA, eD


def _max_kernel(xh_ref, da_ref, o_ref, *, kpad, k):
    """Running per-column max of |xsh| · dabs over the row grid."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    G8 = da_ref.shape[0]
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (G8, kpad), 1) // jnp.int32(k)
    gsel = (
        jax.lax.broadcasted_iota(jnp.int32, (G8, kpad), 0) == lane_group
    ).astype(jnp.float32)
    dexp = jax.lax.dot_general(
        da_ref[:],
        gsel,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (SUB, kpad) — exact copies (one-hot contraction at HIGHEST)
    prod = jnp.abs(xh_ref[:]) * dexp
    cand = jnp.max(prod.reshape(SUB // 8, 8, kpad), axis=0)  # (8, kpad)
    o_ref[...] = jnp.maximum(o_ref[...], cand)


@partial(jax.jit, static_argnames=("k", "interpret"))
def _max_prepass(xsh, dabs, k, G, interpret=False):
    """(8, kpad) per-column running max of |xsh|·|d| (fold rows outside)."""
    n_pad, kpad = xsh.shape
    n_steps = n_pad // SUB
    G8 = dabs.shape[0]
    return pl.pallas_call(
        partial(_max_kernel, kpad=kpad, k=k),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((SUB, kpad), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, SUB), lambda i: (i * 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, kpad), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, kpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xsh, dabs)


def _v4_combine(tot, eA, eD, exps, k, G):
    """Weight the f64 anti-diagonal sums and fold the packed groups."""
    kp = G * k
    sw = jnp.exp2(
        -(T6 * (jnp.arange(S_MAX, dtype=jnp.float64) + 2.0))
    )  # anti-diagonal weights 2^-6(s+2)
    out = jnp.einsum("spq,s->pq", tot, sw)
    scale_a = jnp.exp2(eA + eD) * exps[:kp]
    out = out[:kp, :kp] * (scale_a[:, None] * exps[None, :kp])
    out4 = out.reshape(G, k, G, k)
    gi = jnp.arange(G)
    return out4[gi, :, gi, :].sum(axis=0)


@partial(jax.jit, static_argnames=("n", "k", "G", "interpret"))
def _sandwich_v4_jit(xsh, xsl, bstk, exps, d, n, k, G, interpret=False):
    """Exact ``X.T @ diag(d) @ X`` from the v4 plane cache."""
    dhc, dlc, ra, eA, eD = _v4_prep(xsh, d, n, k, G, interpret=interpret)
    parts = _v4_parts(xsh, xsl, dhc, dlc, ra, bstk, k, G, interpret=interpret)
    tot = parts[:S_MAX].astype(jnp.float64) + parts[S_MAX:].astype(jnp.float64)
    return _v4_combine(tot, eA, eD, exps, k, G)


def tmv_from_cache(cache: PlaneCacheV4, r) -> jax.Array:
    """``X.T @ r`` from the v4 plane cache's int8 B-stack (no Pallas).

    One batched int8 MXU dot per grid step reads the descending B-stack
    exactly once (the only O(n·k) traffic — the bf16/f32 tmv routes read
    2-3.5× more):

        out_int[t, p·G+g, j, :] = Σ_r qr_p[t·SUB+r, g] · bstk_t[j, r, :]

    with ``qr`` the NP T6-bit planes of the globally scaled r (f32 pair,
    same slicer as the kernel's A side).  Per-(t, pg, j) sums are int32-
    exact (products ≤ 65² = 4225, SUB = 2048 rows → ≤ 2^23.1); the step
    sum and plane weighting run in f64.  All 64 (p, q) plane pairs are
    kept (they come free from one dot), so unlike the sandwich there is
    no anti-diagonal truncation — the only error is the 48-bit pair
    slicing + the final f64 combine (measured ≲ 1e-15 relerr).

    Counterpart of the reference's dense transpose-matvec
    (``tabmat/ext/dense_helpers-tmpl.cpp:286-344``).
    """
    return _tmv_v4_jit(cache.bstk, cache.exps, r, cache.n, cache.k, cache.G)


@partial(jax.jit, static_argnames=("n", "k", "G"))
def _tmv_v4_jit(bstk, exps, r, n, k, G):
    kpad = bstk.shape[1]
    kp = G * k
    n_steps = bstk.shape[0] // (NP * SUB)
    n_pad = n_steps * SUB
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
    rhs = bstk.reshape(n_steps, NP, SUB, kpad)  # block j holds plane NP-1-j
    oi = jax.lax.dot_general(
        lhs,
        rhs,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (n_steps, NP·G, NP, kpad), exact
    o = jnp.sum(
        oi.reshape(n_steps, NP, G, NP, kpad).astype(jnp.float64), axis=0
    )  # (NP, G, NP, kpad)
    p_i = jnp.arange(NP)[:, None]
    q_i = (NP - 1 - jnp.arange(NP))[None, :]
    w = jnp.exp2(-(T6 * (p_i + q_i + 2)).astype(jnp.float64))
    og = jnp.einsum("pgqk,pq->gk", o, w)[:, :kp].reshape(G, G, k)
    gi = jnp.arange(G)
    out = og[gi, gi, :] * exps[:kp].reshape(G, k)  # group g × its own lanes
    return jnp.sum(out, axis=0) * jnp.exp2(er)
