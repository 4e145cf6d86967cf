"""Wide-sparse sandwich on the MXU: exact int8 slice products.

``X.T @ diag(d) @ X`` for sparse X too wide for the pair-expansion or
dense-mirror paths (reference kernel: ``tabmat/ext/sparse.pyx:17-77``,
a CSC SpGEMM walker).  TPU formulation:

- shift to a non-negative weighting without any host sync:
  ``S(d) = S_sym(d − min d) + (min d) · XᵀX`` with ``XᵀX`` structural
  (computed once through the same machinery and cached);
- slice ``B = sqrt(d′) ⊙ X`` into 7-bit integer planes **on the nonzeros
  only** (per-column exact scales via a padded structural layout), pack
  4 planes per int32 two's-complement byte lanes, scatter-densify the two
  packed words (the library's only scatter — compiled once, ~27 ms / 4M
  nnz at runtime; pattern holes decode to exact slice zeros), and unpack
  to int8 planes;
- ``S_sym = Σ_{p≤q} w_pq · sym(B_pᵀ B_q)``: 12 slice pairs cover 49 bits
  ≥ the platform's 48-bit f64 storage; every int8×int8 product is a ≤2^12
  integer and the MXU's int32 accumulation is exact for n ≤ 2^18 rows per
  chunk (row-chunked above that);
- int32 partials combine in f64 with the per-column scale outer product.

Cost at the reference's ``sparse_wide`` design (40k×10k, 4M nnz): the MXU
work is 12 × (10k, 40k, 10k) int8 matmuls at the measured ~90 T-MAC/s
(~0.6 s device wall vs ~1.0 s for the previous host round-trip).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T_BITS = 7
N_SLICES = 7  # 7·7 = 49 ≥ 48-bit platform f64
MAX_LEVEL = 5  # keep pairs p+q ≤ 5: coverage (5+2)·7 = 49 bits
# int32-exact contraction bound: |products| ≤ 2^12, so 2^12·rows < 2^31
ROW_CHUNK = 1 << 18
# int8-plane budget: N_SLICES bytes per element of the densified planes
MAX_PLANE_ELEMENTS = 1 << 29

SYM_PAIRS = [
    (p, q)
    for p in range(N_SLICES)
    for q in range(p, N_SLICES)
    if p + q <= MAX_LEVEL
]


def supported(n_rows: int, n_cols: int, nnz: int, dtype) -> bool:
    from .._config import on_tpu
    from . import pallas_gather

    if not on_tpu() or np.dtype(dtype) != np.float64:
        return False
    if n_rows * n_cols > MAX_PLANE_ELEMENTS:
        return False
    return pallas_gather.supported(n_rows + 1, np.float64)


class WideSandwichPlan:
    """Structural device state for one sparse matrix (built lazily once)."""

    def __init__(self, csc):
        from . import pallas_gather

        n_rows, n_cols = csc.shape
        self.shape = (n_rows, n_cols)
        nnz = csc.nnz
        rows = csc.indices.astype(np.int32, copy=False)
        counts = np.diff(csc.indptr)
        cols = np.repeat(np.arange(n_cols, dtype=np.int32), counts)
        self.nnz = nnz
        self.vals = jnp.asarray(csc.data)
        self.rows = jnp.asarray(rows)
        self.cols = jnp.asarray(cols)
        # padded per-column layout for exact per-column scales of sqrt(d)·X:
        # entry (j, t) points at the row of column j's t-th nonzero, or at
        # the zero sentinel n_rows
        M = max(int(counts.max()), 1)
        padded = np.full((n_cols, M), n_rows, dtype=np.int32)
        within = np.arange(nnz) - np.repeat(csc.indptr[:-1], counts)
        padded[cols, within] = rows
        self.pad_shape = (n_cols, M)
        self.padded_codes2d = jnp.asarray(
            pallas_gather.build_codes2d(padded.reshape(-1))
        )
        self.rows_codes2d = jnp.asarray(pallas_gather.build_codes2d(rows))
        self.cols_codes2d = jnp.asarray(pallas_gather.build_codes2d(cols))
        abs_pad = np.zeros((n_cols, M))
        abs_pad[cols, within] = np.abs(csc.data)
        self.abs_pad = jnp.asarray(abs_pad)
        self.gram = None  # cached XᵀX (f64), built on first use
        self.struct = None  # cached structural int8 planes of X (matvec/tmv)

    # registered as a pytree below: the structural arrays ride into jit as
    # ARGUMENTS (device-resident, cache-friendly), never as HLO constants


def _gather_ext(table_ext, codes2d, count):
    """table_ext[codes] via the Pallas lane-shuffle gather (sentinel → 0)."""
    from . import pallas_gather

    return pallas_gather.table_gather(table_ext, codes2d, count)


_PLAN_LEAVES = (
    "vals",
    "rows",
    "cols",
    "padded_codes2d",
    "rows_codes2d",
    "cols_codes2d",
    "abs_pad",
)


def _plan_flatten(p: WideSandwichPlan):
    return tuple(getattr(p, k) for k in _PLAN_LEAVES), (
        p.shape,
        p.nnz,
        p.pad_shape,
    )


def _plan_unflatten(aux, leaves):
    p = object.__new__(WideSandwichPlan)
    p.shape, p.nnz, p.pad_shape = aux
    for k, v in zip(_PLAN_LEAVES, leaves):
        setattr(p, k, v)
    p.gram = None
    p.struct = None
    return p


jax.tree_util.register_pytree_node(
    WideSandwichPlan, _plan_flatten, _plan_unflatten
)


@jax.jit
def _sym_sandwich(plan: WideSandwichPlan, sqrt_d: jax.Array) -> jax.Array:
    """Σ_i d_i x_i x_iᵀ as exact int8 slice products of sqrt(d)·X."""
    n, k = plan.shape
    nnz = plan.nnz
    sqrt_d_ext = jnp.concatenate([sqrt_d, jnp.zeros((1,), sqrt_d.dtype)])

    # exact per-column scale: max |x_ij|·sqrt(d_i) over the padded layout
    g_pad = _gather_ext(
        sqrt_d_ext, plan.padded_codes2d, plan.pad_shape[0] * plan.pad_shape[1]
    ).reshape(plan.pad_shape)
    colmax = jnp.max(plan.abs_pad * g_pad, axis=1)
    # +1 bit of headroom keeps every slice integer within ±2^6
    e = jnp.ceil(jnp.log2(jnp.maximum(colmax, 1e-300))) + 1.0
    scale = jnp.exp2(e)  # (k,)

    # slice the nonzeros: z_t = sqrt(d)[row_t] · x_t / scale[col_t]
    g_nnz = _gather_ext(sqrt_d_ext, plan.rows_codes2d, nnz)
    inv_scale = _gather_ext(jnp.exp2(-e), plan.cols_codes2d, nnz)
    z = plan.vals * g_nnz * inv_scale

    # Slice extraction runs in NATIVE f32 pair arithmetic — the platform's
    # emulated-f64 round mis-rounds occasionally, which bf16 slices absorb
    # but an int8 cast would clamp into garbage.  f32 round/subtract are
    # correctly rounded and the extraction below is exact: q·w is an exact
    # f32 product (7-bit int × power of two), hi − q·w is Sterbenz-exact,
    # and the carrier pair (hi, lo) renormalizes with an exact TwoSum.
    # |q| ≤ 65 always, well inside int8.
    hi = z.astype(jnp.float32)
    lo = (z - hi.astype(jnp.float64)).astype(jnp.float32)

    # two's-complement byte packing: 4 slice planes per int32 word, so
    # scatter holes (structural zeros) decode to exact slice zeros
    packs = []
    word = jnp.zeros((nnz,), jnp.int32)
    for p in range(N_SLICES):
        s_p = jnp.float32(1 << ((p + 1) * T_BITS))
        w_p = jnp.float32(0.5 ** ((p + 1) * T_BITS))
        qp = jnp.round(hi * s_p)
        hi = hi - qp * w_p
        s = hi + lo  # TwoSum renormalization (exact error tracking)
        bb = s - hi
        lo = (hi - (s - bb)) + (lo - bb)
        hi = s
        word = word | ((qp.astype(jnp.int32) & 0xFF) << (8 * (p % 4)))
        if p % 4 == 3 or p == N_SLICES - 1:
            packs.append(word)
            word = jnp.zeros((nnz,), jnp.int32)

    # the library's one scatter: densify the packed words (the pattern is
    # structural; XLA compiles this once per shape)
    dense_packs = [
        jnp.zeros((n, k), jnp.int32).at[plan.rows, plan.cols].set(w)
        for w in packs
    ]
    planes = []
    for p in range(N_SLICES):
        w = dense_packs[p // 4]
        sh = 8 * (p % 4)
        # arithmetic shifts sign-extend the byte lane
        planes.append(((w << (24 - sh)) >> 24).astype(jnp.int8))

    # Σ over symmetric slice pairs, row-chunked to keep int32 exact
    n_chunks = -(-n // ROW_CHUNK)
    S = jnp.zeros((k, k), dtype=jnp.float64)
    for p, q in SYM_PAIRS:
        acc = None
        for c in range(n_chunks):
            lo = c * ROW_CHUNK
            hi = min(n, lo + ROW_CHUNK)
            part = jax.lax.dot_general(
                planes[p][lo:hi],
                planes[q][lo:hi],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # chunk partials are exact int32; cross-chunk sums go to f64
            # (int32 would overflow past ~2^19 total rows)
            partf = part.astype(jnp.float64)
            acc = partf if acc is None else acc + partf
        Spq = acc
        if p != q:
            Spq = Spq + Spq.T
        S = S + Spq * (0.5 ** ((p + q + 2) * T_BITS))
    return S * (scale[:, None] * scale[None, :])


# ---------------------------------------------------------------------------
# Wide matvec / transpose-matvec on the same int8 machinery.
#
# The nonzero walk is gather-bound on this platform (~13 ns/element ≈ 52 ms
# at 4M nnz) while one HBM pass over the densified int8 planes is ~3-4 ms,
# so the MXU formulation wins despite reading 100× the nonzero bytes.  The
# planes here are STRUCTURAL (d-independent, q_p of X/scale with per-column
# power-of-two scales), built once and cached on the plan; the vector side
# is sliced per call (k or n elements — negligible).  Every int8×int8
# product is ≤ 2^13 and the i32 MXU accumulation is exact for contraction
# lengths ≤ 2^18 (`supported` gates shapes well inside that).
# Counterpart of the reference CSR walkers ``tabmat/ext/sparse.pyx:79-199``.
# ---------------------------------------------------------------------------

# exact i32 accumulation bound for the matvec/tmv contractions
MAX_CONTRACT = 1 << 18


def matvec_supported(plan: WideSandwichPlan) -> bool:
    n, k = plan.shape
    return max(n, k) <= MAX_CONTRACT


@jax.jit
def _structural_planes_jit(plan: WideSandwichPlan):
    """Int8 slice planes of X itself: X = Σ_p q_p·2^-(p+1)T ⊙ scale[cols]."""
    n, k = plan.shape
    nnz = plan.nnz
    colmax = jnp.max(plan.abs_pad, axis=1)
    e = jnp.ceil(jnp.log2(jnp.maximum(colmax, 1e-300))) + 1.0
    # plain XLA gather: this build runs ONCE per matrix (structural), so
    # the ~13 ns/element serial gather is irrelevant — and it keeps this
    # path runnable on CPU for the numerics tests
    inv_scale = jnp.take(jnp.exp2(-e), plan.cols)
    z = plan.vals * inv_scale
    hi = z.astype(jnp.float32)
    lo = (z - hi.astype(jnp.float64)).astype(jnp.float32)
    packs = []
    word = jnp.zeros((nnz,), jnp.int32)
    for p in range(N_SLICES):
        s_p = jnp.float32(1 << ((p + 1) * T_BITS))
        w_p = jnp.float32(0.5 ** ((p + 1) * T_BITS))
        qp = jnp.round(hi * s_p)
        hi = hi - qp * w_p
        s = hi + lo
        bb = s - hi
        lo = (hi - (s - bb)) + (lo - bb)
        hi = s
        word = word | ((qp.astype(jnp.int32) & 0xFF) << (8 * (p % 4)))
        if p % 4 == 3 or p == N_SLICES - 1:
            packs.append(word)
            word = jnp.zeros((nnz,), jnp.int32)
    dense_packs = [
        jnp.zeros((n, k), jnp.int32).at[plan.rows, plan.cols].set(w)
        for w in packs
    ]
    planes = []
    for p in range(N_SLICES):
        w = dense_packs[p // 4]
        sh = 8 * (p % 4)
        planes.append(((w << (24 - sh)) >> 24).astype(jnp.int8))
    return tuple(planes), jnp.exp2(e)


def _structural_planes(plan: WideSandwichPlan):
    if plan.struct is None:
        plan.struct = _structural_planes_jit(plan)
    return plan.struct


# vector-side slice count: the vector shares ONE global scale (the
# contraction crosses columns), so its coverage must absorb the dynamic
# range of scale⊙v on top of the 49 result bits.  14·7 = 98 bits keeps
# full accuracy for ranges up to ~2^49; extra rhs columns are ~free on
# the MXU.  The f32-pair carrier below runs dry past ~2^-46 of the lead
# — later slices are exact zeros, harmless.
N_VEC_SLICES = 14


def _slice_vec_int8(u: jax.Array):
    """Exact int8 slices of an f64 vector under one global scale.

    Returns (U (len, N_VEC_SLICES) int8, exp f64) with
    ``u ≈ (Σ_q U[:, q]·2^-(q+1)T) · exp`` to 98 bits below the largest
    element (platform f64 is an (hi, lo) f32 pair).
    """
    m = jnp.max(jnp.abs(u))
    e = jnp.ceil(jnp.log2(jnp.maximum(m, 1e-300))) + 1.0
    z = u * jnp.exp2(-e)
    hi = z.astype(jnp.float32)
    lo = (z - hi.astype(jnp.float64)).astype(jnp.float32)
    qs = []
    for q in range(N_VEC_SLICES):
        s_q = jnp.float32(1 << ((q + 1) * T_BITS))
        w_q = jnp.float32(0.5 ** ((q + 1) * T_BITS))
        qq = jnp.round(hi * s_q)
        hi = hi - qq * w_q
        s = hi + lo
        bb = s - hi
        lo = (hi - (s - bb)) + (lo - bb)
        hi = s
        qs.append(qq.astype(jnp.int8))
    return jnp.stack(qs, axis=1), jnp.exp2(e)


_PAIR_W = [
    [0.5 ** ((p + q + 2) * T_BITS) for q in range(N_VEC_SLICES)]
    for p in range(N_SLICES)
]


@jax.jit
def _wide_matvec_jit(planes, scale, v):
    u = scale * v  # exact: power-of-two per-column scales
    U, eu = _slice_vec_int8(u)  # (k, N_SLICES)
    parts = [
        jax.lax.dot_general(
            P, U, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float64)
        for P in planes
    ]  # each (n, N_SLICES), exact integers
    w = jnp.asarray(_PAIR_W, dtype=jnp.float64)
    return jnp.einsum("pnq,pq->n", jnp.stack(parts), w) * eu


@jax.jit
def _wide_tmv_jit(planes, scale, u):
    U, eu = _slice_vec_int8(u)  # (n, N_SLICES)
    parts = [
        jax.lax.dot_general(
            P, U, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float64)
        for P in planes
    ]  # each (k, N_SLICES)
    w = jnp.asarray(_PAIR_W, dtype=jnp.float64)
    return jnp.einsum("pkq,pq->k", jnp.stack(parts), w) * (eu * scale)


def wide_matvec(plan: WideSandwichPlan, v: jax.Array) -> jax.Array:
    """Exact ``X @ v`` via the cached structural int8 planes."""
    planes, scale = _structural_planes(plan)
    return _wide_matvec_jit(planes, scale, v)


def wide_transpose_matvec(plan: WideSandwichPlan, u: jax.Array) -> jax.Array:
    """Exact ``Xᵀ @ u`` via the cached structural int8 planes."""
    planes, scale = _structural_planes(plan)
    return _wide_tmv_jit(planes, scale, u)


@jax.jit
def _wide_sandwich_jit(plan, d, gram):
    dmin = jnp.min(d)
    sqrt_d = jnp.sqrt(jnp.maximum(d - dmin, 0.0))
    S = _sym_sandwich(plan, sqrt_d)
    return S + dmin * gram


def wide_sandwich(plan: WideSandwichPlan, d: jax.Array) -> jax.Array:
    """Exact ``Xᵀ diag(d) X`` for arbitrary-sign d (no host syncs).

    ``S(d) = S_sym(d − min d) + (min d)·XᵀX`` — the Gram matrix is
    structural and cached on the plan.
    """
    if plan.gram is None:
        ones = jnp.ones((plan.shape[0],), dtype=jnp.float64)
        plan.gram = _sym_sandwich(plan, ones)
    return _wide_sandwich_jit(plan, d, plan.gram)
