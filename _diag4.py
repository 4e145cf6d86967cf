import time, numpy as np, jax, jax.numpy as jnp
import tabmat_tpu as tm
from tabmat_tpu.ops import ozaki, dense_ops
rng = np.random.default_rng(4)
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
r0 = jnp.asarray(rng.standard_normal(n))

@jax.jit
def _norm(v): return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

mv_jnp = jax.jit(lambda X, v: X @ v)
@jax.jit
def _fold(y):
    return y[:k] + 1e-9*jnp.sum(y)
chain(lambda v: _fold(mv_jnp(X, _norm(v))), v0, "matvec emulated f64 (current)")

cache = ozaki.slice_matrix(X)
jax.block_until_ready(cache[0])
chain(lambda v: _fold(ozaki.matvec_cached(cache[0], cache[1], _norm(v), n=n)), v0,
      "matvec ozaki cached (level-stacked)")

X_hi = X.astype(jnp.float32)
X_lo = (X - X_hi.astype(jnp.float64)).astype(jnp.float32)
jax.block_until_ready((X_hi, X_lo))
@jax.jit
def mv_f32x2(Xh, Xl, v):
    v32 = v.astype(jnp.float32)
    a = jnp.dot(Xh, v32, preferred_element_type=jnp.float32)
    b = jnp.dot(Xl, v32, preferred_element_type=jnp.float32)
    return a.astype(jnp.float64) + b.astype(jnp.float64)
chain(lambda v: _fold(mv_f32x2(X_hi, X_lo, _norm(v))), v0, "matvec f32x2 split")

@jax.jit
def mv_f32(Xh, v):
    return jnp.dot(Xh, v.astype(jnp.float32), preferred_element_type=jnp.float32).astype(jnp.float64)
chain(lambda v: _fold(mv_f32(X_hi, _norm(v))), v0, "matvec f32 only")

@jax.jit
def _foldr(y):
    return jnp.tile(y, n//k) * 1e-3
chain(lambda r: _foldr(dense_ops._transpose_matvec_f64_chunked(X, _norm(r))), r0, "tmv chunked emulated (current)")
chain(lambda r: _foldr(ozaki.transpose_matvec_cached(cache[0], cache[1], _norm(r))), r0, "tmv ozaki cached")

v = jnp.asarray(rng.standard_normal(k))
exact = X_np @ np.asarray(v)
for name, f in [("emul", lambda v: mv_jnp(X, v)),
                ("ozaki", lambda v: ozaki.matvec_cached(cache[0], cache[1], v, n=n)),
                ("f32x2", lambda v: mv_f32x2(X_hi, X_lo, v)),
                ("f32", lambda v: mv_f32(X_hi, v))]:
    got = np.asarray(f(v))
    print(f"relerr {name:6s} {np.abs(got-exact).max()/np.abs(exact).max():.2e}")
