import time, numpy as np, jax, jax.numpy as jnp
import tabmat_tpu as tm
from tabmat_tpu.ops import ozaki
rng = np.random.default_rng(5)
n, k = 1_000_000, 50

def chain(step, x0, label, K1=8, K2=24):
    def run(K):
        x = x0
        for i in range(K):
            x = step(x)
        return float(jnp.sum(x))
    run(2)
    ts = {}
    for K in (K1, K2, K1, K2):
        t0 = time.perf_counter(); run(K); ts[K] = min(ts.get(K,1e9), time.perf_counter()-t0)
    per = (ts[K2]-ts[K1])/(K2-K1)
    print(f"{label:44s} {per*1e3:8.2f} ms/op", flush=True)

X_np = rng.standard_normal((n, k))
X = jnp.asarray(X_np); X.block_until_ready()
v0 = jnp.asarray(rng.standard_normal(k))

@jax.jit
def _norm(v): return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
@jax.jit
def _fold(y): return y[:k] + 1e-9*jnp.sum(y)

cache_T = ozaki.slice_matrix_T(X)
jax.block_until_ready(cache_T[0])
chain(lambda v: _fold(ozaki.matvec_cached_T(cache_T[0], cache_T[1], _norm(v), n=n)), v0,
      "matvec ozaki transposed slices")

# accuracy
v = jnp.asarray(rng.standard_normal(k))
exact = X_np @ np.asarray(v)
got = np.asarray(ozaki.matvec_cached_T(cache_T[0], cache_T[1], v, n=n))
print("relerr", np.abs(got-exact).max()/np.abs(exact).max())

# through the class (cache built lazily)
dm = tm.DenseMatrix(X_np)
chain(lambda v: _fold(dm.matvec(_norm(v))), v0, "DenseMatrix.matvec (routed)")

# full mv+tmv pair now
chain(lambda v: _norm(dm.transpose_matvec(dm.matvec(v))), v0, "dense mv+tmv pair (new)")

# irls step again (uses dense_ops matvec internally via _make_mv_tmv - raw X)
from tabmat_tpu.glm import irls_step
y_dev = jnp.asarray(X_np @ rng.standard_normal(k) + 0.1*rng.standard_normal(n))
w_dev = jnp.ones(n, dtype=jnp.float64)
b0 = jnp.asarray(rng.standard_normal(k) * 0.01)
chain(lambda b: irls_step(X, y_dev, w_dev, b, family="gaussian", n_cg=8), b0,
      "glm_irls_step dense (raw X)", K1=4, K2=12)
