"""Round-5 probe: where do glm_irls_step_mixed's 19 ms go?

The bench shape is 1M × (5 dense + 1000 cat + 1000 cat), poisson, 8 CG
iterations, through DeviceDesign + irls_step (explicit-Hessian path:
one f32 sandwich + CG on the (2005, 2005) H).  This probe measures the
chained-marginal device cost of each stage in isolation:

- full irls_step            (the BENCH cell)
- X32.sandwich(w32)         (the explicit f32 Hessian)
- matvec f64 (eta)          (one design matvec)
- tmv f64 (gradient)        (one design transpose-matvec)
- family terms + CG algebra (by difference)

Usage (TPU, relay idle): python docs/probes/r5_glm_mixed_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import tabmat_tpu as tm  # noqa: E402
from tabmat_tpu.bench import main as bm  # noqa: E402
from tabmat_tpu.glm import irls_step  # noqa: E402
from tabmat_tpu.parallel.design import DeviceDesign  # noqa: E402


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    split = tm.SplitMatrix(
        [
            tm.DenseMatrix(rng.standard_normal((n, 5))),
            tm.CategoricalMatrix(
                rng.integers(0, 1000, n).astype(np.int32),
                categories=np.arange(1000),
            ),
            tm.CategoricalMatrix(
                rng.integers(0, 1000, n).astype(np.int32),
                categories=np.arange(1000),
            ),
        ]
    )
    design = DeviceDesign.from_matrix(split)
    km = split.shape[1]
    y = jnp.asarray(rng.poisson(1.0, n).astype(np.float64))
    w = jnp.asarray(np.ones(n))
    b0 = jnp.asarray(rng.standard_normal(km) * 0.001)

    print("supports_sandwich:", design.supports_sandwich, flush=True)
    X32 = design.astype_float(jnp.float32)

    # full step
    t = bm._marginal_device(
        lambda b: irls_step(design, y, w, b, family="poisson", n_cg=8), b0
    )
    print(f"irls_step full: {t*1e3:.2f} ms", flush=True)

    # f32 sandwich alone (chained through a probe scalar)
    w32 = jnp.asarray(np.abs(rng.random(n)) + 0.5, dtype=jnp.float32)
    sandwich32 = jax.jit(lambda d: X32.sandwich(d))
    t = bm._marginal_device(
        lambda d: d * (1.0 + 1e-9 * jnp.ravel(sandwich32(d))[0]), w32
    )
    print(f"X32.sandwich(w32): {t*1e3:.2f} ms", flush=True)

    # f64 matvec (eta) alone
    mv = jax.jit(design.matvec)
    t = bm._marginal_device(
        lambda b: b0 * (1.0 + 1e-9 * jnp.tanh(jnp.sum(mv(b)))), b0
    )
    print(f"design.matvec f64: {t*1e3:.2f} ms", flush=True)

    # f64 tmv (gradient) alone
    r0 = jnp.asarray(rng.standard_normal(n))
    tmv = jax.jit(design.transpose_matvec)
    t = bm._marginal_device(
        lambda r: r0 * (1.0 + 1e-9 * jnp.tanh(jnp.sum(tmv(r)))), r0
    )
    print(f"design.tmv f64: {t*1e3:.2f} ms", flush=True)

    # f32 matvec/tmv (CG-grade) for comparison
    mv32 = jax.jit(X32.matvec)
    b032 = b0.astype(jnp.float32)
    t = bm._marginal_device(
        lambda b: b032 * (1.0 + 1e-9 * jnp.tanh(jnp.sum(mv32(b)))), b032
    )
    print(f"X32.matvec f32: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
