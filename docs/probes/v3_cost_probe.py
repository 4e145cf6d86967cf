"""Probe where the v3 sandwich kernel time goes at 1M x 50 (packed kp=100).

Variants (kernel-level flags):
  base        : current kernel as shipped
  magic       : jnp.round -> magic-number round-to-nearest-even (add/sub 1.5*2^23)
  noconcat    : skip the lane concat; sum 7x7 small dots instead (per-issue cost probe)
  noslice     : skip slicing entirely (reuse xh for all planes) -- load+dot floor
  nodot       : skip the dot (accumulate a broadcast instead) -- slicing-only cost
  qbcache     : X-side slices precomputed outside (bf16 (n,7k) input), slice only qa
"""
import time, functools, os
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

jax.config.update("jax_enable_x64", True)

T7 = 7
SUB = 128
NSUB = 8
BT = SUB * NSUB
_SPLIT_C = 4097.0
LO_SKIP = 3

MAGIC = float(1.5 * 2 ** 23)


def _round(x, magic):
    if magic:
        return (x + jnp.float32(MAGIC)) - jnp.float32(MAGIC)
    return jnp.round(x)


def _two_prod_err(a, b, p):
    t = _SPLIT_C * a
    ah = t - (t - a)
    al = a - ah
    t = _SPLIT_C * b
    bh = t - (t - b)
    bl = b - bh
    return ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _plane_slices_pair(vh, vl, n_planes, magic):
    def rounds(x32):
        R = [_round(x32 * jnp.float32(2.0 ** (p * T7)), magic) for p in range(n_planes + 1)]
        return [R[1]] + [R[p + 1] - jnp.float32(1 << T7) * R[p] for p in range(1, n_planes)]

    def rounds_lo(x32):
        R = {p: _round(x32 * jnp.float32(2.0 ** (p * T7)), magic) for p in range(LO_SKIP + 1, n_planes + 1)}
        out = [R[LO_SKIP + 1]]
        out += [R[p + 1] - jnp.float32(1 << T7) * R[p] for p in range(LO_SKIP + 1, n_planes)]
        return out

    qh = rounds(vh)
    if n_planes <= LO_SKIP:
        return [a.astype(jnp.bfloat16) for a in qh]
    ql = rounds_lo(vl)
    out = [a.astype(jnp.bfloat16) for a in qh[:LO_SKIP]]
    out += [(a + b).astype(jnp.bfloat16) for a, b in zip(qh[LO_SKIP:], ql)]
    return out


def make_kernel(kp, k, G, n_planes, variant):
    magic = variant == "magic"

    def kern(xh_ref, xl_ref, dh_ref, dl_ref, ra_ref, o_ref):
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

        def expand_d(dsub):
            acc = jnp.zeros((SUB, kp), jnp.float32)
            for g in range(G):
                colg = jnp.sum(dsub * (group_iota == g).astype(jnp.float32), axis=1, keepdims=True)
                acc = jnp.where(lane_group == g, colg, acc)
            return acc

        def body(j, carry):
            hi, lo = carry
            xh = xh_ref[pl.ds(j * SUB, SUB), :]
            xl = xl_ref[pl.ds(j * SUB, SUB), :]
            dh = expand_d(dh_ref[pl.ds(j * SUB, SUB), :])
            dl = expand_d(dl_ref[pl.ds(j * SUB, SUB), :])
            p1 = xh * dh
            perr = _two_prod_err(xh, dh, p1)
            tail = perr + xh * dl + xl * dh + xl * dl
            yh = p1 * ra
            yl = tail * ra
            if variant == "noslice":
                qa = [xh.astype(jnp.bfloat16)] * n_planes
                qb = qa
            else:
                qa = _plane_slices_pair(yh, yl, n_planes, magic)
                qb = _plane_slices_pair(xh, xl, n_planes, magic)
            if variant == "nodot":
                s0 = sum(q.astype(jnp.float32).sum() for q in qa) + sum(
                    q.astype(jnp.float32).sum() for q in qb)
                part = jnp.full((npk, npk), 0.0, jnp.float32) + s0 * 0.0
            elif variant == "noconcat":
                rows = []
                for p in range(n_planes):
                    blks = [jax.lax.dot_general(qa[p], qb[q],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                            for q in range(n_planes)]
                    rows.append(jnp.concatenate(blks, axis=1))
                part = jnp.concatenate(rows, axis=0)
            else:
                part = jax.lax.dot_general(
                    jnp.concatenate(qa, axis=1), jnp.concatenate(qb, axis=1),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            s = hi + part
            bb = s - hi
            err = (hi - (s - bb)) + (part - bb)
            return s, lo + err

        hi, lo = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NSUB), body, (zeros, zeros))
        ohi = o_ref[0]
        s = ohi + hi
        bb = s - ohi
        err = (ohi - (s - bb)) + (hi - bb)
        o_ref[0] = s
        o_ref[1] = o_ref[1] + lo + err

    return kern


def make_qbcache_kernel(kp, k, G, n_planes):
    """X-side bf16 slices precomputed: qb_ref is (BT, n_planes*kp) bf16."""
    def kern(xh_ref, xl_ref, qb_ref, dh_ref, dl_ref, ra_ref, o_ref):
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

        def expand_d(dsub):
            acc = jnp.zeros((SUB, kp), jnp.float32)
            for g in range(G):
                colg = jnp.sum(dsub * (group_iota == g).astype(jnp.float32), axis=1, keepdims=True)
                acc = jnp.where(lane_group == g, colg, acc)
            return acc

        def body(j, carry):
            hi, lo = carry
            xh = xh_ref[pl.ds(j * SUB, SUB), :]
            xl = xl_ref[pl.ds(j * SUB, SUB), :]
            qb = qb_ref[pl.ds(j * SUB, SUB), :]
            dh = expand_d(dh_ref[pl.ds(j * SUB, SUB), :])
            dl = expand_d(dl_ref[pl.ds(j * SUB, SUB), :])
            p1 = xh * dh
            perr = _two_prod_err(xh, dh, p1)
            tail = perr + xh * dl + xl * dh + xl * dl
            yh = p1 * ra
            yl = tail * ra
            qa = _plane_slices_pair(yh, yl, n_planes, False)
            part = jax.lax.dot_general(
                jnp.concatenate(qa, axis=1), qb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = hi + part
            bb = s - hi
            err = (hi - (s - bb)) + (part - bb)
            return s, lo + err

        hi, lo = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NSUB), body, (zeros, zeros))
        ohi = o_ref[0]
        s = ohi + hi
        bb = s - ohi
        err = (ohi - (s - bb)) + (hi - bb)
        o_ref[0] = s
        o_ref[1] = o_ref[1] + lo + err

    return kern


@functools.partial(jax.jit, static_argnames=("k", "G", "n_planes", "variant"))
def run_variant(xsh, xsl, dhc, dlc, ra, k, G, n_planes, variant):
    n_pad, kp = xsh.shape
    npk = n_planes * kp
    kern = make_kernel(kp, k, G, n_planes, variant)
    spec = pl.BlockSpec((BT, kp), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((BT, G), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(n_pad // BT,),
        in_specs=[spec, spec, dspec, dspec,
                  pl.BlockSpec((1, kp), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, npk, npk), lambda i: (i * 0, i * 0, i * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, npk, npk), jnp.float32),
    )(xsh, xsl, dhc, dlc, ra)


@functools.partial(jax.jit, static_argnames=("k", "G", "n_planes"))
def run_qbcache(xsh, xsl, qb, dhc, dlc, ra, k, G, n_planes):
    n_pad, kp = xsh.shape
    npk = n_planes * kp
    kern = make_qbcache_kernel(kp, k, G, n_planes)
    spec = pl.BlockSpec((BT, kp), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((BT, npk), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((BT, G), lambda i: (i, i * 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(n_pad // BT,),
        in_specs=[spec, spec, qspec, dspec, dspec,
                  pl.BlockSpec((1, kp), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, npk, npk), lambda i: (i * 0, i * 0, i * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, npk, npk), jnp.float32),
    )(xsh, xsl, qb, dhc, dlc, ra)


def bench_varied(fn_of_i, n=10):
    """Time with DISTINCT inputs per iteration (the axon relay memoizes
    identical (program, args) calls -- same-input loops time nothing)."""
    r = fn_of_i(0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(n):
        r = fn_of_i(1 + i)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from tabmat_tpu.ops import pallas_sandwich_v3 as v3
    rng = np.random.default_rng(0)
    n, k = 1_000_000, 50
    X = rng.standard_normal((n, k)) * np.exp(rng.standard_normal(k) * 3)[None, :]
    d = np.abs(rng.standard_normal(n)) + 0.1
    Xd = jnp.asarray(X, jnp.float64)
    dd = jnp.asarray(d, jnp.float64)

    cache = v3.build_plane_cache_packed(Xd)
    print("packed:", cache.xsh.shape, "G=", cache.G, flush=True)

    # reference result + end-to-end shipped time (distinct d per iter)
    ref = np.asarray((X * d[:, None]).T @ X)
    dvars = [dd * (1.0 + 1e-9 * i) for i in range(12)]
    for v in dvars:
        v.block_until_ready()
    t_ship = bench_varied(lambda i: v3.sandwich_v3_packed(cache, dvars[i % 12]))
    got = np.asarray(v3.sandwich_v3_packed(cache, dd))
    relerr = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"shipped e2e: {t_ship:8.3f} ms  relerr {relerr:.2e}", flush=True)

    # prep the kernel operands once (mirror _sandwich_v3_packed_jit's prep)
    G, kk = cache.G, cache.k
    n_pad2, kp = cache.xsh.shape
    n2 = -(-n // G)
    ds = dd * jnp.exp2(-jnp.ceil(jnp.log2(jnp.max(jnp.abs(dd)))))
    dsh1 = ds.astype(jnp.float32)
    dsl1 = (ds - dsh1.astype(jnp.float64)).astype(jnp.float32)

    def compact(v):
        v = jnp.pad(v, (0, n2 * G - n)).reshape(n2, G)
        return jnp.pad(v, [(0, n_pad2 - n2), (0, 0)])

    dhc = jax.device_put(compact(dsh1))
    dlc = jax.device_put(compact(dsl1))
    # distinct per-iteration d planes (relay memoization defeat)
    dhcs = [jax.device_put(dhc * np.float32(1.0 + 2.0**-20 * i)) for i in range(12)]
    for v in dhcs:
        v.block_until_ready()
    m = jnp.max(jnp.abs(cache.xsh).reshape(n_pad2, G, kk) * jnp.abs(dhc)[:, :, None], axis=0).reshape(kp)
    eA = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(m.astype(jnp.float64), 1e-300) * (1 + 1e-5))), -100, 100)
    ra = jax.device_put(jnp.exp2(-eA).astype(jnp.float32).reshape(1, kp))
    NP = 7

    for variant in ["base", "magic", "noslice", "nodot", "noconcat"]:
        try:
            t = bench_varied(lambda i, v=variant: run_variant(
                cache.xsh, cache.xsl, dhcs[i % 12], dlc, ra, kk, G, NP, v))
            print(f"{variant:10s}: {t:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{variant:10s}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # qbcache: precompute X-side slices on host-ish (xla) once
    def slice_planes_xla(vh, vl):
        planes = []
        R = [jnp.round(vh * (2.0 ** (p * T7))) for p in range(NP + 1)]
        qh = [R[1]] + [R[p + 1] - float(1 << T7) * R[p] for p in range(1, NP)]
        Rl = {p: jnp.round(vl * (2.0 ** (p * T7))) for p in range(LO_SKIP + 1, NP + 1)}
        ql = [Rl[LO_SKIP + 1]] + [Rl[p + 1] - float(1 << T7) * Rl[p] for p in range(LO_SKIP + 1, NP)]
        out = [a.astype(jnp.bfloat16) for a in qh[:LO_SKIP]]
        out += [(a + b).astype(jnp.bfloat16) for a, b in zip(qh[LO_SKIP:], ql)]
        return jnp.concatenate(out, axis=1)

    qb = jax.jit(slice_planes_xla)(cache.xsh, cache.xsl)
    qb = jax.device_put(qb)
    print("qb planes:", qb.shape, qb.dtype, flush=True)
    try:
        t = bench_varied(lambda i: run_qbcache(
            cache.xsh, cache.xsl, qb, dhcs[i % 12], dlc, ra, kk, G, NP))
        print(f"{'qbcache':10s}: {t:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{'qbcache':10s}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
