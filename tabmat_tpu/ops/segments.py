"""Scatter-free segment reduction — the core TPU primitive of tabmat-tpu.

The reference implements categorical/sparse reductions with scatter-adds
protected by OpenMP atomics or per-thread buffers
(``tabmat/ext/cat_split_helpers-tmpl.cpp:4-94``).  On TPU, XLA scatter is
the wrong tool (serialized, and pathologically slow to compile on the
target platform), so every "out[key[i]] += val[i]" in this library runs
through a **SegmentPlan** instead:

1. once per key array (= per matrix, since keys are structural):
   ``perm = argsort(keys)``, ``bounds = searchsorted(sorted_keys, 0..K)``;
2. per operation: gather values through ``perm``, inclusive ``cumsum``,
   and difference the cumsum at ``bounds`` — a pure gather/scan pipeline
   that vectorizes perfectly on the VPU.

Cost per op: one (n,)-gather + one (n,)-cumsum + one (K+1,)-gather.  The
argsort happens once at construction and is cached on the owning matrix.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SegmentPlan:
    """Precomputed reduction plan for a fixed integer key array.

    Attributes
    ----------
    perm: (n,) int32 device array — stable argsort of the keys.
    bounds: (num_segments + 1,) int32 device array — segment boundaries in
        the sorted order; segment ``s`` occupies ``perm[bounds[s]:bounds[s+1]]``.
    num_segments: static int.
    codes_col: optional (n_pad, 1) int32 device array — structural code
        layout for the MXU one-hot segment-sum (TPU, num_segments ≤ 2^14);
        None where the gather/cumsum pipeline is the better (or only) route.
    """

    perm: jax.Array
    bounds: jax.Array
    num_segments: int
    codes_col: jax.Array = None

    def sum(self, values: jax.Array) -> jax.Array:
        """Segment-sum ``values`` by the plan's keys → (num_segments,)."""
        if self.codes_col is not None and values.dtype in (
            jnp.float32,
            jnp.float64,
        ):
            from . import pallas_segsum

            return pallas_segsum.segsum_auto(
                values, self.codes_col, self.num_segments
            )
        return _segment_sum(self.perm, self.bounds, values)

    def sum2d(self, values: jax.Array) -> jax.Array:
        """Row-wise segment-sum of a (n, m) matrix → (num_segments, m)."""
        from . import pallas_segsum

        if (
            self.codes_col is not None
            and values.dtype in (jnp.float32, jnp.float64)
            and values.shape[1] * 7 <= 128  # lhs slice rows stay one MXU pass
            # the 2-D variant exists only for the flat kernel; wider code
            # spaces (codes_col built for the bucketed 1-D route) fall back
            and pallas_segsum.supported(self.num_segments, values.dtype)
        ):
            return pallas_segsum.segsum_2d(values, self.codes_col, self.num_segments)
        return _segment_sum_2d(self.perm, self.bounds, values)


def build_plan(keys: np.ndarray, num_segments: int) -> SegmentPlan:
    """Build a SegmentPlan on the host (done once per matrix).

    Host construction is deliberate: it runs while the device is busy and
    avoids paying a device sort compile for every new (n,) shape.  Keys are
    bounded ints, so the native O(n + K) counting sort is used when the
    helper library is available (``tabmat_tpu._native``), with a numpy
    argsort fallback.  Out-of-range keys (e.g. -1 for missing categories)
    sort to the front and fall outside every bound pair.
    """
    keys = np.asarray(keys)
    if keys.dtype != np.int32 and num_segments < 2**31 and (
        len(keys) == 0 or keys.max(initial=0) < 2**31
    ):
        keys32 = keys.astype(np.int32, copy=False)
    else:
        keys32 = keys

    # counting sort allocates O(num_segments) — cap to keep memory bounded
    if keys32.dtype == np.int32 and num_segments <= (1 << 24):
        from .. import _native

        perm, bounds = _native.counting_argsort(keys32, num_segments)
    else:
        perm = np.argsort(keys, kind="stable").astype(np.int64)
        sorted_keys = keys[perm]
        bounds = np.searchsorted(
            sorted_keys, np.arange(num_segments + 1, dtype=keys.dtype)
        ).astype(np.int64)
    from . import pallas_segsum

    codes_col = None
    if keys32.dtype == np.int32 and pallas_segsum.supported_any(
        num_segments, n=len(keys32)
    ):
        codes_col = jnp.asarray(pallas_segsum.build_codes_col(keys32))
    return SegmentPlan(
        perm=jnp.asarray(perm),
        bounds=jnp.asarray(bounds),
        num_segments=num_segments,
        codes_col=codes_col,
    )


@jax.jit
def _segment_sum(perm: jax.Array, bounds: jax.Array, values: jax.Array) -> jax.Array:
    gathered = jnp.take(values, perm)
    csum = jnp.cumsum(gathered)
    padded = jnp.concatenate([jnp.zeros((1,), dtype=csum.dtype), csum])
    return jnp.take(padded, bounds[1:]) - jnp.take(padded, bounds[:-1])


@jax.jit
def _segment_sum_2d(perm: jax.Array, bounds: jax.Array, values: jax.Array) -> jax.Array:
    gathered = jnp.take(values, perm, axis=0)
    csum = jnp.cumsum(gathered, axis=0)
    padded = jnp.concatenate(
        [jnp.zeros((1, values.shape[1]), dtype=csum.dtype), csum], axis=0
    )
    return jnp.take(padded, bounds[1:], axis=0) - jnp.take(padded, bounds[:-1], axis=0)
