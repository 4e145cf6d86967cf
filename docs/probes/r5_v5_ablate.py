"""Round-5 ablation: where do the v5 sandwich's 29 µs/step go?

Variants of the v5 kernel at 1M×50 (245 grid steps):

- full      — the shipped kernel (slice + store + one all-pairs dot)
- noslice   — skip the d-expand/two-prod/slicing VPU chain; astk is a
              trivial int8 cast of xh broadcast to all planes (same
              stream, same dot shape) → isolates the MXU+stream cost
- nodot     — full VPU chain but the MXU dot replaced by a cheap VPU
              consume of astk → isolates the VPU+stream cost
- raw dots  — XLA (not Pallas) int8 and bf16 matmuls of the per-step
              shape to check whether int8 contracts at the 2× MXU rate

Usage (TPU, relay idle): python docs/probes/r5_v5_ablate.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tabmat_tpu.bench import main as bm  # noqa: E402
from tabmat_tpu.ops import pallas_sandwich_v5 as v5  # noqa: E402
from tabmat_tpu.ops.pallas_sandwich_v4 import NP, SUB, _v4_prep  # noqa: E402


def _variant_kernel(
    xh_ref, xl_ref, dh_ref, dl_ref, ra_ref, bstk_ref, o_ref, astk_ref,
    acc_ref, *, kpad, k, n_steps, mode,
):
    t = pl.program_id(0)
    npk = NP * kpad

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        o_ref[...] = jnp.zeros_like(o_ref)

    if mode == "noslice":
        q = jnp.clip(xh_ref[:] * 64.0, -65, 65).astype(jnp.int8)
        for p in range(NP):
            astk_ref[:, pl.ds(p * kpad, kpad)] = q
    else:
        from tabmat_tpu.ops.pallas_sandwich_v4 import (
            _plane_slices_pair, _two_prod_err,
        )

        ra = ra_ref[:]
        xh = xh_ref[:]
        xl = xl_ref[:]
        G8 = dh_ref.shape[0]
        lane_group = (
            jax.lax.broadcasted_iota(jnp.int32, (G8, kpad), 1) // jnp.int32(k)
        )
        gsel = (
            jax.lax.broadcasted_iota(jnp.int32, (G8, kpad), 0) == lane_group
        ).astype(jnp.float32)

        def expand_d(dsub):
            return jax.lax.dot_general(
                dsub, gsel, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        dh = expand_d(dh_ref[:])
        dl = expand_d(dl_ref[:])
        p1 = xh * dh
        perr = _two_prod_err(xh, dh, p1)
        tail = perr + xh * dl + xl * dh + xl * dl
        qa = _plane_slices_pair(p1 * ra, tail * ra, False)
        for p in range(NP):
            astk_ref[:, pl.ds(p * kpad, kpad)] = qa[p]

    if mode == "nodot":
        acc_ref[...] = acc_ref[...] + astk_ref[:npk, :].astype(jnp.int32)
    else:
        part = jax.lax.dot_general(
            astk_ref[...], bstk_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[...] = acc_ref[...] + part

    @pl.when(t == jnp.int32(n_steps - 1))
    def _():
        o_ref[0] = acc_ref[...].astype(jnp.float32)


@partial(jax.jit, static_argnames=("k", "mode"))
def _variant(xsh, xsl, dhc, dlc, ra, bstk, k, mode):
    n_pad, kpad = xsh.shape
    npk = NP * kpad
    n_steps = n_pad // SUB
    G8 = dhc.shape[0]
    spec = pl.BlockSpec((SUB, kpad), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((G8, SUB), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_variant_kernel, kpad=kpad, k=k, n_steps=n_steps, mode=mode),
        grid=(n_steps,),
        in_specs=[
            spec, spec, dspec, dspec,
            pl.BlockSpec((1, kpad), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, npk), lambda i: (i, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, npk, npk), lambda i: (i * 0, i * 0, i * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, npk, npk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SUB, npk), jnp.int8),
            pltpu.VMEM((npk, npk), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xsh, xsl, dhc, dlc, ra, bstk)


def main():
    n, k = 1_000_000, 50
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, k)) * np.exp(rng.uniform(-4, 4, (1, k))))
    d0 = jnp.asarray(rng.random(n))
    cache = v5.build_plane_cache(X)
    jax.block_until_ready(cache.bstk)
    n_steps = cache.xsh.shape[0] // SUB
    print(jax.devices(), f"n_steps={n_steps}", flush=True)

    for mode in ["full", "noslice", "nodot"]:
        @partial(jax.jit, static_argnames=())
        def step(dd, mode=mode):
            dhc, dlc, ra, eA, eD = _v4_prep(cache.xsh, dd, n, k, cache.G)
            out = _variant(cache.xsh, cache.xsl, dhc, dlc, ra, cache.bstk, k, mode)
            return dd * (1.0 + 1e-9 * jnp.tanh(jnp.ravel(out)[0] * 1e-9))

        t = bm._marginal_device(step, d0)
        print(f"{mode:8s}: {t*1e3:.3f} ms  ({t/n_steps*1e6:.2f} us/step)", flush=True)

    # raw XLA dots of the aggregate shape: contraction 16·SUB keeps the
    # launch overhead small relative to the MACs
    m = 16 * SUB
    A8 = jnp.asarray(rng.integers(-65, 65, (m, NP * 128)), dtype=jnp.int8)
    B8 = jnp.asarray(rng.integers(-65, 65, (m, NP * 128)), dtype=jnp.int8)
    Ab = A8.astype(jnp.bfloat16)
    Bb = B8.astype(jnp.bfloat16)

    @jax.jit
    def dot8(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def dotb(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    macs = m * (NP * 128) ** 2
    s8 = jnp.float32(1.0)

    def step8(s):
        o = dot8((A8 * s.astype(jnp.int8)).astype(jnp.int8), B8)
        return s + 1e-9 * jnp.tanh(o[0, 0].astype(jnp.float32) * 1e-9)

    t8 = bm._marginal_device(step8, s8)

    def stepb(s):
        o = dotb(Ab * s.astype(jnp.bfloat16), Bb)
        return s + 1e-9 * jnp.tanh(o[0, 0] * 1e-9)

    tb = bm._marginal_device(stepb, s8)
    print(
        f"raw int8 dot ({m}x{NP*128})^T: {t8*1e3:.3f} ms = {macs/t8/1e12:.1f} TMAC/s",
        flush=True,
    )
    print(
        f"raw bf16 dot ({m}x{NP*128})^T: {tb*1e3:.3f} ms = {macs/tb/1e12:.1f} TMAC/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
