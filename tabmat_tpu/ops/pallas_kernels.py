"""Pallas TPU kernels (float32 fast paths).

The float64 path goes through chunked XLA contractions (Pallas on this TPU
generation rejects f64 refs).  For float32, a fused Pallas sandwich reads
``X`` from HBM exactly once per op — the jnp formulation materializes
``d·X`` in HBM, tripling traffic on what is a bandwidth-bound op
(reference's equivalent is the packed-panel C++ kernel,
``tabmat/ext/dense_helpers-tmpl.cpp:198-262``).

Kernel shape: grid over row chunks; the (k, k) accumulator lives in the
output block (constant index map → stays resident in VMEM across the grid);
each step does one MXU contraction of a d-scaled chunk against itself.

Mosaic quirks worked around (measured on the target chip):
- a (chunk, 1) second input fails to legalize → ``d`` rides in the padded
  lane space of ``X`` as an extra column (zero extra HBM traffic, since the
  lane dimension is padded to 128 anyway);
- in-kernel f32 ``dot`` defaults to bf16 multiplies → ``precision=HIGHEST``
  forces the exact f32 (3-pass) MXU algorithm.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# k (padded) beyond which the (k,k) VMEM accumulator would not fit
_MAX_K_PAD = 1024
_CHUNK = 1024


def _sandwich_kernel(xd_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    block = xd_ref[:]
    x = block[:, :-1]
    d = block[:, -1:]
    o_ref[:] += jax.lax.dot_general(
        x,
        x * d,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _sandwich_call(Xd: jax.Array, interpret: bool = False) -> jax.Array:
    n, kp1 = Xd.shape
    k = kp1 - 1
    grid = n // _CHUNK
    return pl.pallas_call(
        _sandwich_kernel,
        grid=(grid,),
        # NB: index maps use `i * 0` (not literal 0) so the returned tuple
        # stays i32 under jax x64 — a mixed (i32, i64) index tuple fails
        # Mosaic legalization on this backend.
        in_specs=[
            pl.BlockSpec((_CHUNK, kp1), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, k), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        interpret=interpret,
    )(Xd)


def dense_sandwich_f32(X: jax.Array, d: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused f32 sandwich ``X.T @ diag(d) @ X`` (single HBM pass over X).

    Pads rows to the chunk size (with d=0, exact) and columns to one short
    of the lane width, storing ``d`` in the final column; falls back to the
    jnp path when the padded accumulator would overflow VMEM.
    """
    n, k = X.shape
    # columns padded so that total width (incl. the d column) is lane-aligned
    k_pad = max(128, -(-(k + 1) // 128) * 128) - 1
    if k_pad + 1 > _MAX_K_PAD:
        Xs = X * d[:, None]
        return jnp.einsum("ij,ik->jk", Xs, X, preferred_element_type=X.dtype)

    n_pad = -(-n // _CHUNK) * _CHUNK
    Xd = jnp.zeros((n_pad, k_pad + 1), dtype=jnp.float32)
    Xd = Xd.at[:n, :k].set(X.astype(jnp.float32))
    Xd = Xd.at[:n, k_pad].set(d.astype(jnp.float32))
    S = _sandwich_call(Xd, interpret=interpret)
    return S[:k, :k]
