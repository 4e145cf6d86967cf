"""Windowed take for MONOTONE indices: ``out[i] = src[idx[i]]``, idx sorted.

The general table gather (``pallas_gather``) walks every 128-wide table row
per code tile — cost ∝ C = ceil(len(src)/128) — because codes can point
anywhere.  The sparse kernels' gathers are different: their indices are
*sorted* (CSR row ids of nnz in row-major order; CSR/CSC indptr boundaries
walked output-major), so one (BR, 128) code tile touches only a narrow
band of table rows.  This kernel exploits that: per tile it computes the
first touched row ``row0 = min(idx) >> 7`` with one VPU reduce and
select-accumulates over the next ``W`` rows only, where the window height
``W`` is a per-array structural bound computed on host (max tile span).
Cost drops from C to W passes per tile — for the benchmark sparse designs
that is 10–100× less VPU work than the capped general gather, with no
scalar prefetch or manual DMA.

Replaces the element-serial XLA gather (~13 ns/element) in:
- CSR transpose-matvec: gather ``v[row]`` over row-sorted nnz
  (reference walker: ``tabmat/ext/sparse.pyx:142-199``),
- CSR/CSC matvec boundary diffs: gather ``cumsum[indptr[r]]`` over rows
  (reference: ``tabmat/ext/sparse.pyx:79-140``).

Padding codes repeat the LAST real index (not a negative sentinel): the
pad rides the same window as the tail of the data, keeping tile spans
tight; padded outputs are sliced off on reshape.  float64 sources are
gathered as (hi, lo) f32 planes in one kernel pass, exactly as
``pallas_gather`` does (no f64 refs on TPU; the platform's f64 IS this
pair, so the split round-trips).
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np

from .pallas_gather import _lane_gather, _pad_table_2d

LANE = 128
BR = 256  # code rows per grid step (BR*LANE = 32768 codes)

# windows taller than this fall back to the general gather / XLA take —
# beyond ~1/8 of the general kernel's 4096-row cap the advantage is gone
MAX_WINDOW_ROWS = 1024

# the kernel keeps the WHOLE source resident in VMEM ((C, 128) per f32
# plane, two planes for f64): cap the source so the table stays ≤ ~9.4 MB
# of the ~16 MB scoped budget (codes/output blocks need the rest)
MAX_SRC_ENTRIES = 1_200_000


class MonotonePlan:
    """Structural plan for a windowed take over a fixed sorted index array.

    Host-side; uploads of ``codes2d``/``ws`` happen lazily on first use
    and are cached by the owner.  ``None``-able: :func:`build_plan`
    returns None when the indices are not monotone or some tile spans
    too many rows.  ``ws`` holds each tile's first touched table row
    (UNclipped — the kernel clamps against the padded table height),
    precomputed on host so the kernel derives no dynamic index from a
    vector reduce (Mosaic wants scalar indices from SMEM).
    """

    __slots__ = ("codes2d", "ws", "window", "n")

    def __init__(self, codes2d: np.ndarray, ws: np.ndarray, window: int, n: int):
        self.codes2d = codes2d
        self.ws = ws
        self.window = window
        self.n = n


def build_plan(idx: np.ndarray, src_len: "int | None" = None) -> "MonotonePlan | None":
    """Plan a windowed take for sorted ``idx`` (any integer dtype, ≥ 0).

    ``src_len`` is the length of the source the take will read (defaults
    to ``idx[-1] + 1``); plans over sources past :data:`MAX_SRC_ENTRIES`
    are rejected — the kernel holds the whole source in VMEM.
    """
    idx = np.asarray(idx)
    n = idx.shape[0]
    if n == 0:
        return None
    if np.any(np.diff(idx) < 0) or idx[0] < 0:
        return None
    if int(idx[-1]) >= np.iinfo(np.int32).max:
        return None  # >2^31 source entries: int32 code layout would wrap
    if (src_len if src_len is not None else int(idx[-1]) + 1) > MAX_SRC_ENTRIES:
        return None
    rows = -(-n // LANE)
    rows_pad = -(-rows // BR) * BR
    flat = np.full(rows_pad * LANE, int(idx[-1]), dtype=np.int32)
    flat[:n] = idx.astype(np.int32, copy=False)
    codes2d = flat.reshape(rows_pad, LANE)
    hi = codes2d >> 7
    tiles = hi.reshape(-1, BR * LANE)
    ws = tiles.min(axis=1).astype(np.int32)
    span = int((tiles.max(axis=1) - ws).max()) + 1
    if span > MAX_WINDOW_ROWS:
        return None
    # quantize W so the jit key is stable across random-data realizations
    # of the same design (span varies a little seed to seed; a fresh
    # remote compile costs 30-200 s, ≤63 extra passes cost microseconds)
    window = min(-(-(span + 8) // 64) * 64, MAX_WINDOW_ROWS)
    return MonotonePlan(codes2d, ws, window, n)


def _window_kernel_1plane(ws_ref, tab_ref, c_ref, o_ref, *, W):
    C = tab_ref.shape[0]
    codes = c_ref[:]
    hi = codes >> 7
    lo = codes & (LANE - 1)
    row0 = jnp.clip(
        ws_ref[pl.program_id(0)], jnp.int32(0), jnp.int32(max(C - W, 0))
    )

    def body(t, acc):
        r = row0 + t
        row = tab_ref[pl.ds(r, 1), :]
        bcast = jnp.broadcast_to(row, (BR, LANE))
        g = _lane_gather(bcast, lo)
        return jnp.where(hi == r, g, acc)

    o_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(W), body, jnp.zeros((BR, LANE), tab_ref.dtype)
    )


def _window_kernel_2plane(ws_ref, t0_ref, t1_ref, c_ref, o0_ref, o1_ref, *, W):
    C = t0_ref.shape[0]
    codes = c_ref[:]
    hi = codes >> 7
    lo = codes & (LANE - 1)
    row0 = jnp.clip(
        ws_ref[pl.program_id(0)], jnp.int32(0), jnp.int32(max(C - W, 0))
    )

    def body(t, accs):
        a0, a1 = accs
        r = row0 + t
        keep = hi == r
        r0 = jnp.broadcast_to(t0_ref[pl.ds(r, 1), :], (BR, LANE))
        r1 = jnp.broadcast_to(t1_ref[pl.ds(r, 1), :], (BR, LANE))
        a0 = jnp.where(keep, _lane_gather(r0, lo), a0)
        a1 = jnp.where(keep, _lane_gather(r1, lo), a1)
        return a0, a1

    z = jnp.zeros((BR, LANE), t0_ref.dtype)
    o0, o1 = jax.lax.fori_loop(jnp.int32(0), jnp.int32(W), body, (z, z))
    o0_ref[:] = o0
    o1_ref[:] = o1


@partial(jax.jit, static_argnames=("n", "W", "interpret"))
def _take_f32(src, codes2d, ws, n, W, interpret=False):
    tab2d = _pad_table_2d(src)
    C = tab2d.shape[0]
    if C < W:
        tab2d = jnp.pad(tab2d, [(0, W - C), (0, 0)])
        C = W
    R = codes2d.shape[0]
    out = pl.pallas_call(
        partial(_window_kernel_1plane, W=W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((C, LANE), lambda i, ws: (jnp.int32(0), jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, ws: (i, jnp.int32(0))),
            ],
            out_specs=pl.BlockSpec((BR, LANE), lambda i, ws: (i, jnp.int32(0))),
        ),
        out_shape=jax.ShapeDtypeStruct((R, LANE), src.dtype),
        interpret=interpret,
    )(ws, tab2d, codes2d)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("n", "W", "interpret"))
def _take_f64(src, codes2d, ws, n, W, interpret=False):
    hi = src.astype(jnp.float32)
    lo = (src - hi.astype(jnp.float64)).astype(jnp.float32)
    t0 = _pad_table_2d(hi)
    t1 = _pad_table_2d(lo)
    C = t0.shape[0]
    if C < W:
        t0 = jnp.pad(t0, [(0, W - C), (0, 0)])
        t1 = jnp.pad(t1, [(0, W - C), (0, 0)])
        C = W
    R = codes2d.shape[0]
    o0, o1 = pl.pallas_call(
        partial(_window_kernel_2plane, W=W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((C, LANE), lambda i, ws: (jnp.int32(0), jnp.int32(0))),
                pl.BlockSpec((C, LANE), lambda i, ws: (jnp.int32(0), jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, ws: (i, jnp.int32(0))),
            ],
            out_specs=[
                pl.BlockSpec((BR, LANE), lambda i, ws: (i, jnp.int32(0))),
                pl.BlockSpec((BR, LANE), lambda i, ws: (i, jnp.int32(0))),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(ws, t0, t1, codes2d)
    out = o0.astype(jnp.float64) + o1.astype(jnp.float64)
    return out.reshape(-1)[:n]


def monotone_take(src: jax.Array, plan: MonotonePlan, codes2d_dev, ws_dev, interpret=False):
    """``src[idx]`` for the sorted idx captured in ``plan``.

    ``codes2d_dev``/``ws_dev`` are device uploads of the plan layouts
    (cached by the caller).  Returns (n,) in src's dtype.
    """
    if src.dtype == jnp.float64:
        return _take_f64(src, codes2d_dev, ws_dev, plan.n, plan.window, interpret)
    return _take_f32(src, codes2d_dev, ws_dev, plan.n, plan.window, interpret)


def supported(dtype) -> bool:
    import os

    from .._config import on_tpu

    if not on_tpu():
        return False
    # kill switch: fall back to the general-gather / XLA-take routes
    if os.environ.get("TABMAT_TPU_NO_WINDOW_TAKE", "0") == "1":
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.float64)
