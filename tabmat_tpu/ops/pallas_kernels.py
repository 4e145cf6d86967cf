"""Pallas TPU kernels (float32 fast paths).

The float64 path goes through XLA's software-emulated f64 contraction
(Pallas on this TPU generation rejects f64 refs).  For float32, a fused
Pallas sandwich reads ``X`` from HBM exactly once per op — the jnp
formulation materializes ``d·X`` in HBM, tripling traffic on what is a
bandwidth-bound op (reference's equivalent is the packed-panel C++ kernel,
``tabmat/ext/dense_helpers-tmpl.cpp:198-262``).

Kernel shape: grid over row chunks; the (k, k) accumulator lives in the
output block (constant index map → stays resident in VMEM across the grid);
each step does one MXU contraction of a d-scaled chunk against itself.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# k (padded) beyond which the (k,k) VMEM accumulator would not fit
_MAX_K_PAD = 1024
_CHUNK = 1024


def _sandwich_kernel(x_ref, d_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]
    xd = x * d_ref[:]  # (chunk, 1) broadcast over columns
    o_ref[:] += jax.lax.dot_general(
        x,
        xd,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _sandwich_call(X: jax.Array, d: jax.Array, interpret: bool = False) -> jax.Array:
    n, k = X.shape
    grid = n // _CHUNK
    return pl.pallas_call(
        _sandwich_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_CHUNK, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        interpret=interpret,
    )(X, d)


def dense_sandwich_f32(X: jax.Array, d: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused f32 sandwich ``X.T @ diag(d) @ X`` (single HBM pass over X).

    Pads rows to the chunk size (with d=0, exact) and columns to the lane
    width; falls back to the jnp path when the padded accumulator would
    overflow VMEM.
    """
    n, k = X.shape
    k_pad = max(128, -(-k // 128) * 128)
    if k_pad > _MAX_K_PAD:
        Xd = X * d[:, None]
        return jnp.einsum("ij,ik->jk", Xd, X, preferred_element_type=X.dtype)

    n_pad = -(-n // _CHUNK) * _CHUNK
    if n_pad != n or k_pad != k:
        Xp = jnp.zeros((n_pad, k_pad), dtype=X.dtype).at[:n, :k].set(X)
        dp = jnp.zeros((n_pad,), dtype=d.dtype).at[:n].set(d)
    else:
        Xp, dp = X, d
    S = _sandwich_call(Xp, dp.reshape(-1, 1), interpret=interpret)
    return S[:k, :k]
