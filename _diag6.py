import jax; jax.config.update("jax_enable_x64", True)
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
rng = np.random.default_rng(6)
n, k, S, L = 1_000_000, 50, 7, 5

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
    print(f"{label:46s} {per*1e3:8.2f} ms/op", flush=True)

# calibration: f64 elementwise mul+add over 8M elements
a64 = jnp.asarray(rng.standard_normal(8_000_000)); a64.block_until_ready()
f1 = jax.jit(lambda x: x * 1.0000001 + 0.5)
chain(lambda x: f1(x), a64, "f64 mul+add 8M")

# f32->f64 convert 8M
a32 = jnp.asarray(rng.standard_normal(8_000_000).astype(np.float32)); a32.block_until_ready()
f2 = jax.jit(lambda x, t: x.astype(jnp.float64).sum() * 1e-9 + t)
chain(lambda t: f2(a32, t), jnp.asarray(0.0), "astype f32->f64 8M + f64 sum")

# bf16 matmul (6,50)@(50,1M) x7 alone, f32 out, fold in f32
QXT = jnp.asarray((rng.integers(-128,128,(S,k,n))).astype(np.int8).astype(jnp.bfloat16)); QXT.block_until_ready()
Qv = jnp.asarray((rng.integers(-128,128,(S,k))).astype(np.int8).astype(jnp.bfloat16)); Qv.block_until_ready()

@jax.jit
def mm_only(QXT, Qv_, t):
    acc = jnp.zeros((n,), jnp.float32)
    for p in range(S):
        m = L - p + 1
        if m <= 0: break
        P = jax.lax.dot_general(Qv_[:m], QXT[p], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
        acc = acc + P.sum(0)   # f32 fold (timing only)
    return acc * 1e-9 + t
chain(lambda t: mm_only(QXT, Qv, t[:n]), jnp.zeros(n), "7 grouped matmuls, f32 fold only")

@jax.jit
def mm_f64(QXT, Qv_, t):
    acc = jnp.zeros((n,), jnp.float64)
    for p in range(S):
        m = L - p + 1
        if m <= 0: break
        P = jax.lax.dot_general(Qv_[:m], QXT[p], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
        sc = jnp.asarray([0.5**((p+q+2)*8) for q in range(m)])
        acc = acc + jnp.tensordot(sc, P.astype(jnp.float64), axes=1)
    return acc * 1e-9 + t
chain(lambda t: mm_f64(QXT, Qv, t[:n]), jnp.zeros(n), "7 grouped matmuls + f64 combine")
