"""Exact float64 contractions on the bf16 MXU (Ozaki-style slicing).

The TPU has no f64 ALUs, and the backend's emulated f64 ``dot`` both rounds
(beyond ~16k contraction) and runs at only ~20 GF/s.  This module computes
**exactly rounded** f64-grade contractions out of *error-free* bf16 matmuls:

1. Per (row-chunk, column), normalize by a power-of-two block exponent and
   split each value into ``S`` integer slices of ``T`` bits:
   ``x = exp2(e) · Σ_p q_p · 2^{-(p+1)T}`` with ``|q_p| ≤ 2^T``.
2. Every slice is exactly representable in bf16 (small integers), every
   bf16×bf16 product is an exact ≤2T-bit integer, and the MXU's f32
   accumulator sums ``CHUNK`` of them without rounding while
   ``2T + log2(CHUNK) ≤ 24``.
3. Slice-pair partials are combined in f64 with the tracked exponents.

Result: bit-level ~1e-15 relative accuracy at full MXU speed (measured
3e-16..3e-15 even with 1e8 intra-column dynamic range), versus 2e-8 from
the emulated path.  Used for the dense f64 sandwich and transpose-matvec on
TPU; the same machinery runs (slowly, via emulated bf16) on CPU for tests.

Terms kept: slice pairs with ``p + q ≤ MAX_LEVEL`` cover ≥ 56 bits of the
product mantissa — beyond f64 itself.
"""

import jax
import jax.numpy as jnp
import numpy as np

T = 8  # bits per slice (bf16 mantissa)
S = 7  # slices: 7*8 = 56 ≥ 53 mantissa bits
CHUNK = 128  # 2T + log2(CHUNK) = 23 ≤ 24 → exact f32 accumulation
MAX_LEVEL = 5  # keep pairs with p+q ≤ 5 → 21 matmuls, ~56 covered bits


def _slice_global(A: jax.Array):
    """Global per-column block-exponent integer slicing.

    A: (n, k) f64 → (slices (S, n, k) bf16, exps (k,) f64).  A single
    column scale (vs per-chunk) lets all slice-pair partials share one
    exponent weighting, so cross-chunk sums reduce straight to (k, k) with
    an f64 accumulator — half the HBM traffic of the per-chunk variant.
    Accuracy is 2^-56 relative to each column's global max.
    """
    absmax = jnp.max(jnp.abs(A), axis=0, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exps = jnp.exp2(e)
    r = A * jnp.exp2(-e)  # exact (power-of-two scale)
    slices = []
    for p in range(S):
        # NB: round-based extraction, NOT the classic (r+c)-c Veltkamp trick
        # — under jit, XLA's algebraic simplifier folds (r+c)-c back to r,
        # silently destroying the slice alignment (observed on this stack).
        q = jnp.round(r * jnp.float64(1 << ((p + 1) * T)))
        slices.append(q.astype(jnp.bfloat16))
        r = r - q * (0.5 ** ((p + 1) * T))
    return jnp.stack(slices), exps[0]


def _pad_reshape(Q: jax.Array, n: int):
    nc = -(-n // CHUNK)
    n_pad = nc * CHUNK
    shape = (S, nc, CHUNK) + tuple(Q.shape[2:])
    pad = [(0, 0), (0, n_pad - n)] + [(0, 0)] * (Q.ndim - 2)
    return jnp.pad(Q, pad).reshape(shape)


def slice_matrix(X: jax.Array):
    """Precompute (and shape for chunked matmuls) the slices of a matrix.

    Returned (QX (S, nc, CHUNK, k) bf16, eX (k,) f64) can be cached by the
    owning matrix: the X-side of every sandwich is structural, so only the
    d-scaled side needs re-slicing per call.
    """
    QX, eX = _slice_global(X)
    return _pad_reshape(QX, X.shape[0]), eX


@jax.jit
def sandwich(X: jax.Array, d: jax.Array) -> jax.Array:
    """Exact ``X.T @ diag(d) @ X`` via error-free bf16 slice products.

    Same mixed-width formulation as the cached path: T8 structural X
    slices × T7 f32-plane slices of the d-scaled side.
    """
    QB, eB = slice_matrix(X)
    return _sandwich_cached_mixed_jit(X, d, QB, eB)


def sandwich_cached(X: jax.Array, d: jax.Array, cache) -> jax.Array:
    """Sandwich reusing precomputed X-side slices (single dispatch).

    The per-call (X·d) side is sliced by the f32-plane extractor (T7
    levels, fused native-f32 rounds) — the sequential emulated-f64
    slicing passes used to dominate the whole op at 1M×50.
    """
    QB, eB = cache
    return _sandwich_cached_mixed_jit(X, d, QB, eB)


def _slice_vector(v: jax.Array):
    """Slice a vector with ONE global block exponent (shared across
    elements, required because the vector axis is the contraction axis)."""
    absmax = jnp.max(jnp.abs(v))
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exp = jnp.exp2(e)
    r = v * jnp.exp2(-e)
    slices = []
    for p in range(S):
        q = jnp.round(r * jnp.float64(1 << ((p + 1) * T)))
        slices.append(q.astype(jnp.bfloat16))
        r = r - q * (0.5 ** ((p + 1) * T))
    return jnp.stack(slices), exp


from functools import partial


def slice_matrix_T(X: jax.Array):
    """Transposed slice cache for the matvec: (S, k, n) bf16 + (k,) exps.

    The matvec's per-slice matmul is ``Qv_stack (m, k) @ QXᵀ_p (k, n)`` —
    with ``n`` in the lane dimension the f32 output (m ≤ S rows, n lanes)
    has no lane padding.  (The (S, nc, CHUNK, k) layout used by the
    sandwich puts k = 50 in the lanes, which pads every output tile to 128
    lanes — measured 18× write amplification, 262 ms vs ~2 ms.)
    """
    QX, eX = _slice_global(X)
    return jnp.transpose(QX, (0, 2, 1)), eX


# largest k-contraction whose f32 slice-product accumulation is exact:
# 2T + log2(k) ≤ 24
_MATVEC_K_CHUNK = 256


def cache_worthwhile(n: int, k: int, dtype, max_elements: int) -> bool:
    """Should this (n, k) f64 matrix carry Ozaki slice caches on TPU?

    Single predicate for DenseMatrix and the SparseMatrix dense mirror:
    worthwhile once the emulated dot would need chunking (n > _F64_CHUNK)
    and the 14-byte/element slice budget fits ``max_elements``.
    """
    import numpy as np

    from .._config import on_tpu
    from .dense_ops import _F64_CHUNK, _f64_mode

    return (
        np.dtype(dtype) == np.float64
        and on_tpu()
        and n > _F64_CHUNK
        and n * k <= max_elements
        and _f64_mode() == "ozaki"
    )


@partial(jax.jit, static_argnames=("n",))
def matvec_cached_T(QXT: jax.Array, eX: jax.Array, v: jax.Array, n=None) -> jax.Array:
    """Exact ``X @ v`` from transposed cached slices (S, k, n).

    For each X-slice p the admissible v-slices (q ≤ MAX_LEVEL − p) are
    stacked as matmul ROWS: one (m_p, k) @ (k, n) MXU pass per p — 7
    passes, each reading its X-slice once; partials combine in f64 with
    the tracked exponents.  The k-contraction is chunked at 256 (beyond
    that 2T + log2(k) > 24 and the f32 accumulation would round); for the
    GLM-typical k ≤ 256 this is a single chunk.
    """
    S_, k, n_full = QXT.shape
    Qv, ev = _slice_vector(eX * v)  # (S, k) bf16, scalar exp

    out = jnp.zeros((n_full,), dtype=jnp.float64)
    n_kc = -(-k // _MATVEC_K_CHUNK)
    for p in range(S):
        m = MAX_LEVEL - p + 1  # v-slices q = 0..MAX_LEVEL-p
        if m <= 0:
            break
        P = None
        for c in range(n_kc):
            lo = c * _MATVEC_K_CHUNK
            hi = min(k, lo + _MATVEC_K_CHUNK)
            Pc = jax.lax.dot_general(
                Qv[:m, lo:hi], QXT[p][lo:hi],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (m, n) exact integer f32 per chunk
            # cross-chunk accumulation in f64 keeps exactness at any k
            Pc = Pc.astype(jnp.float64)
            P = Pc if P is None else P + Pc
        # combine rows as ONE fused scaled reduction per pass: the per-q
        # AXPY form re-reads and re-writes the (n,) f64 accumulator m
        # times per pass (~2.8 GB of pure combine traffic at 4M rows —
        # it dominated the 4M×10 matvec cell); XLA fuses cast + scale +
        # sum into a single read of P.  (An f64 einsum would lower to an
        # emulated-f64 contraction instead — measured 54 ms.)
        wq = jnp.asarray(
            [0.5 ** ((p + q + 2) * T) for q in range(m)], dtype=jnp.float64
        )
        out = out + jnp.sum(P * wq[:, None], axis=0)
    out = out * ev
    return out if n is None or n == n_full else out[:n]


@jax.jit
def transpose_matvec_cached(QX: jax.Array, eX: jax.Array, r: jax.Array) -> jax.Array:
    """Exact ``X.T @ r`` from cached X slices (row contraction, chunked).

    The (n,) weight vector is sliced by the cheap f32-plane extractor
    (T7-bit slices, fused native-f32 rounds) — at 1M rows the emulated-f64
    slicing passes used to cost more than the matmuls.  Mixed widths:
    X slices carry T-bit levels, r slices T7-bit; a pair (p, q) weighs
    2^-(T(p+1)+T7(q+1)) and pairs are kept while their leading bit is
    within ~56 of the top (the same coverage rule as the uniform case).
    Products |q_X·q_r| ≤ ~2^15 with CHUNK=128 stay exact in f32.
    """
    S_, nc, c, k = QX.shape
    n = r.shape[0]
    Qr, er = slice_vector_f32planes(r)
    S_r = Qr.shape[0]
    Qr = jnp.pad(Qr, ((0, 0), (0, nc * c - n))).reshape(S_r, nc, c)
    from .._config import on_tpu

    batched = on_tpu()  # CPU XLA cannot execute batched bf16×bf16→f32 dots
    out = jnp.zeros((k,), dtype=jnp.float64)
    for p in range(S_):
        # admissible r-slices for this X-slice: leading product bit within
        # 63 of the top (the uniform rule kept (p+q+2)·8 ≤ 64)
        m_p = sum(
            1 for q in range(S_r) if T * (p + 1) + T7 * (q + 1) <= 63
        )
        if m_p == 0:
            continue
        w = [0.5 ** (T * (p + 1) + T7 * (q + 1)) for q in range(m_p)]
        if batched:
            # stack the q-slices as batch rows so QX[p] is read ONCE per
            # p — the pairwise form re-reads the (n, k) plane per pair
            part = jnp.einsum(
                "qnc,ncj->qnj",
                Qr[:m_p],
                QX[p],
                preferred_element_type=jnp.float32,
            )
            tot = jnp.sum(part, axis=1, dtype=jnp.float64)  # (m_p, k)
            out = out + jnp.einsum(
                "qj,q->j", tot, jnp.asarray(w, dtype=jnp.float64)
            )
        else:
            for q in range(m_p):
                part = jnp.einsum(
                    "ncj,nc->nj",
                    QX[p],
                    Qr[q],
                    preferred_element_type=jnp.float32,
                )
                total = jnp.sum(part, axis=0, dtype=jnp.float64)
                out = out + total * w[q]
    return out * (eX * er)


@jax.jit
def transpose_matvec(X: jax.Array, v: jax.Array) -> jax.Array:
    """Exact ``X.T @ v`` via error-free bf16 slice products."""
    n, k = X.shape
    nc = -(-n // CHUNK)
    n_pad = nc * CHUNK

    QX, eX = _slice_global(X)
    Qv, ev = _slice_global(v[:, None])
    QX = jnp.pad(QX, ((0, 0), (0, n_pad - n), (0, 0))).reshape(S, nc, CHUNK, k)
    Qv = jnp.pad(Qv, ((0, 0), (0, n_pad - n), (0, 0))).reshape(S, nc, CHUNK)

    out = jnp.zeros((k,), dtype=jnp.float64)
    for p in range(S):
        for q in range(S):
            if p + q > MAX_LEVEL:
                continue
            part = jnp.einsum(
                "nci,nc->ni", QX[p], Qv[q], preferred_element_type=jnp.float32
            )
            total = jnp.sum(part, axis=0, dtype=jnp.float64)
            out = out + total * (0.5 ** ((p + q + 2) * T))
    return out * (eX * ev[0])


T7 = 7  # plane-slicing width: |q| ≤ 129 per plane, ≤ 258... see below


def slice_vector_f32planes(v: jax.Array, n_slices: int = 7):
    """Integer bf16 slices of a vector via its native f32 planes.

    The platform stores f64 as an (hi, lo) f32 pair, and ``_slice_vector``'s
    7 sequential emulated-f64 round/sub passes are the dominant per-op cost
    of every cached matvec/segsum at large n.  This extractor runs almost
    entirely in native f32:

    - one f64 scale + split: ``rh = f32(v·2^-e)``, ``rl = f32(v·2^-e − rh)``
      (both exact — power-of-two scale, and the residual of an f32 round of
      a platform value IS the lo plane);
    - per level p, INDEPENDENT f32 rounds via the telescoping identity
      ``q_p = R_{p+1} − 2^T·R_p`` with ``R_p = round(x·2^{pT})`` (the
      first slice absorbs the head: ``q_0 = R_1``) — no sequential
      dependency, so XLA fuses all levels into one pass over the data;
    - the planes' level-p slices are summed in f32 (exact) and converted
      once to bf16.  T = 7 bounds each plane's slice at |q| ≤ 129, and
      the planes' mantissa windows are 24 bits apart, so at most one
      straddling level mixes both — measured bound |q_sum| ≤ ~130, well
      inside bf16's exact-integer range (≤ 256).

    Coverage: n_slices·T bits below the global max (49 bits at the default
    7 — the platform pair itself carries 48; CPU true-f64 loses its bits
    past 48 in the plane split, i.e. ~2e-15 relative).  Returns
    ((S, n) bf16, exp).
    """
    r = v.astype(jnp.float64)
    absmax = jnp.max(jnp.abs(r))
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exp = jnp.exp2(e)
    scaled = r * jnp.exp2(-e)
    rh = scaled.astype(jnp.float32)
    rl = (scaled - rh.astype(jnp.float64)).astype(jnp.float32)

    def plane_slices(x32):
        R = [
            jnp.round(x32 * jnp.float32(2.0 ** (p * T7)))
            for p in range(n_slices + 1)
        ]
        # the first slice absorbs the whole head (no R_0 subtraction):
        # Σ_p q_p·2^{-(p+1)T} then telescopes to R_S·2^{-ST} = x exactly
        return [R[1]] + [
            R[p + 1] - jnp.float32(1 << T7) * R[p] for p in range(1, n_slices)
        ]

    qh = plane_slices(rh)
    ql = plane_slices(rl)
    q = jnp.stack([(a + b).astype(jnp.bfloat16) for a, b in zip(qh, ql)])
    return q, exp


def slice_matrix_f32planes(A: jax.Array, n_slices: int = 7):
    """Per-column T7-bit integer slices of a matrix via its f32 planes.

    The (n, k) twin of :func:`slice_vector_f32planes` — one f64
    scale/split, then fused independent f32 rounds.  Replaces the 7
    sequential emulated-f64 passes of ``_slice_global`` on the
    re-sliced-every-call side of the sandwich.  Returns
    ((S, n, k) bf16, (k,) f64 exps).
    """
    absmax = jnp.max(jnp.abs(A), axis=0, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
    exps = jnp.exp2(e)
    scaled = A * jnp.exp2(-e)
    rh = scaled.astype(jnp.float32)
    rl = (scaled - rh.astype(jnp.float64)).astype(jnp.float32)

    def plane_slices(x32):
        R = [
            jnp.round(x32 * jnp.float32(2.0 ** (p * T7)))
            for p in range(n_slices + 1)
        ]
        return [R[1]] + [
            R[p + 1] - jnp.float32(1 << T7) * R[p] for p in range(1, n_slices)
        ]

    qh = plane_slices(rh)
    ql = plane_slices(rl)
    q = jnp.stack([(a + b).astype(jnp.bfloat16) for a, b in zip(qh, ql)])
    return q, exps[0]


# mixed-width sandwich: T7-sliced A side × T8-cached B side.  Product
# integers are ≤ 2^15, so chunks of 512 stay exact in f32 (vs 128 for the
# uniform T8 pairs) — 4× fewer (nc, k, k) partials to reduce in f64.
_CHUNK_MIXED = 512


@jax.jit
def _sandwich_pairs_mixed(QA, eA, QB, eB) -> jax.Array:
    """(S7, nc', cm, k) T7 slices × (S8, nc, 128, k) T8 cache → (k, k).

    ``cm`` (= QA's chunk) divides the cache's padded row count; the cache
    is re-viewed at that chunking (a pure reshape — same memory layout).
    """
    S7, nc4, cm, k = QA.shape
    S8 = QB.shape[0]
    QBr = QB.reshape(S8, nc4, cm, k)
    out = jnp.zeros((k, k), dtype=jnp.float64)
    for p in range(S7):
        for q in range(S8):
            bits = T7 * (p + 1) + T * (q + 1)
            # same ~63-bit product coverage as the uniform (p+q+2)·8 ≤ 64
            if bits > 63:
                continue
            part = jnp.einsum(
                "nci,ncj->nij",
                QA[p],
                QBr[q],
                preferred_element_type=jnp.float32,
            )
            total = jnp.sum(part, axis=0, dtype=jnp.float64)
            out = out + total * (0.5**bits)
    return out * (eA[:, None] * eB[None, :])


def _mixed_pairs(S_a: int, S_b: int):
    return tuple(
        (p, q)
        for p in range(S_a)
        for q in range(S_b)
        if T7 * (p + 1) + T * (q + 1) <= 63
    )


@jax.jit
def _sandwich_cached_mixed_jit(X, d, QB, eB):
    from .._config import on_tpu
    from . import pallas_pairs

    import os

    n, k = X.shape
    n_pad = QB.shape[1] * QB.shape[2]  # the cache's padded row count
    if (
        on_tpu()
        and pallas_pairs.supported(n, k)
        and os.environ.get("TABMAT_TPU_NO_FUSED_SANDWICH", "0") != "1"
    ):
        # fused kernel: the d-scaled side's T7 slices are built in VMEM
        # from its two column-scaled f32 planes — no QA planes ever touch
        # HBM, and each QB plane is read exactly once
        A = X * d[:, None]
        absmax = jnp.max(jnp.abs(A), axis=0, keepdims=True)
        e = jnp.ceil(jnp.log2(jnp.maximum(absmax, 1e-300)))
        eA = jnp.exp2(e)[0]
        scaled = A * jnp.exp2(-e)
        yh = scaled.astype(jnp.float32)
        yl = (scaled - yh.astype(jnp.float64)).astype(jnp.float32)
        yh = jnp.pad(yh, [(0, n_pad - n), (0, 0)])
        yl = jnp.pad(yl, [(0, n_pad - n), (0, 0)])
        pairs = _mixed_pairs(7, QB.shape[0])
        qb = QB.reshape(QB.shape[0], n_pad, k)
        parts = pallas_pairs.pair_contractions_sliced(yh, yl, qb, pairs)
        tot = parts[:, 0].astype(jnp.float64) + parts[:, 1].astype(jnp.float64)
        w = jnp.asarray(
            [0.5 ** (T7 * (p + 1) + T * (q + 1)) for p, q in pairs],
            dtype=jnp.float64,
        )
        out = jnp.einsum("pij,p->ij", tot, w)
        return out * (eA[:, None] * eB[None, :])
    QA, eA = slice_matrix_f32planes(X * d[:, None])
    cm = _CHUNK_MIXED if n_pad % _CHUNK_MIXED == 0 else CHUNK
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    QA = jnp.pad(QA, pad).reshape(QA.shape[0], n_pad // cm, cm, X.shape[1])
    return _sandwich_pairs_mixed(QA, eA, QB, eB)
