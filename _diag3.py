import time, numpy as np, jax, jax.numpy as jnp
from scipy import sparse as sps
import tabmat_tpu as tm
rng = np.random.default_rng(3)
n, k, ncat = 1_000_000, 50, 10_000

def chain(step, x0, label, K1=8, K2=40):
    def run(K):
        x = x0
        for i in range(K):
            x = step(x)
        return float(jnp.sum(x if not isinstance(x, tuple) else x[0]))
    run(2)  # warm/compile all
    ts = {}
    for K in (K1, K2, K1, K2):   # interleave, keep best
        t0 = time.perf_counter(); run(K); dt = time.perf_counter() - t0
        ts[K] = min(ts.get(K, 1e9), dt)
    per = (ts[K2] - ts[K1]) / (K2 - K1)
    print(f"{label:40s} {per*1e3:8.2f} ms/op   (fixed {ts[K1]-per*K1:6.3f}s)", flush=True)
    return per

@jax.jit
def _norm(v): return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

# --- dense ---
X_np = rng.standard_normal((n, k))
dm = tm.DenseMatrix(X_np)
d0 = jnp.asarray(rng.random(n)); v0 = jnp.asarray(rng.standard_normal(k))
chain(lambda v: _norm(dm.transpose_matvec(dm.matvec(v))), v0, "dense mv+tmv pair (f64 exact)")

@jax.jit
def _dglue(S, d):  # (k,k) result back into a (n,) chain state
    return 0.5 * d + 1e-6 * jnp.sum(S) * jnp.ones_like(d)
chain(lambda d: _dglue(dm.sandwich(d), d), d0, "dense sandwich f64 ozaki")

# --- categorical ---
codes_np = rng.integers(0, ncat, n).astype(np.int32)
cm = tm.CategoricalMatrix(codes_np, categories=np.arange(ncat)); cm.plan
vc0 = jnp.asarray(rng.standard_normal(ncat))
chain(lambda v: _norm(cm.transpose_matvec(cm.matvec(v))), vc0, "cat mv+tmv pair")
@jax.jit
def _cglue(diag, d):
    return 0.5 * d + 1e-6 * jnp.sum(diag) * jnp.ones_like(d)
chain(lambda d: _cglue(cm.sandwich(d).diag, d), d0, "cat sandwich")

# --- sparse ---
S_sp = sps.random(400_000, 100, density=0.01, random_state=0, format="csc")
sm = tm.SparseMatrix(S_sp)
sm._csr_parts(); sm._csc_parts(); sm._pair_sandwich_parts()
vs0 = jnp.asarray(rng.standard_normal(100))
ds0 = jnp.asarray(rng.random(400_000))
chain(lambda v: _norm(sm.transpose_matvec(sm.matvec(v))), vs0, "sparse mv+tmv pair")
@jax.jit
def _sglue(S, d):
    return 0.5 * d + 1e-6 * jnp.sum(S) * jnp.ones_like(d)
chain(lambda d: _sglue(sm.sandwich(d), d), ds0, "sparse sandwich (pair-expansion)")

# --- IRLS steps (already fused) ---
from tabmat_tpu.glm import irls_step
X_dev = dm.unpack()
y_dev = jnp.asarray(X_np @ rng.standard_normal(k) + 0.1*rng.standard_normal(n))
w_dev = jnp.ones(n, dtype=jnp.float64)
b0 = jnp.asarray(rng.standard_normal(k) * 0.01)
chain(lambda b: irls_step(X_dev, y_dev, w_dev, b, family="gaussian", n_cg=8), b0,
      "glm_irls_step dense (8 cg)", K1=4, K2=16)
