import time, numpy as np, jax, jax.numpy as jnp
import tabmat_tpu as tm
rng = np.random.default_rng(1)
n, ncat = 1_000_000, 10_000

def timeit_fresh(f, gen, m=5, label=""):
    a0 = jnp.asarray(gen()); a0.block_until_ready()
    t0=time.perf_counter(); jax.block_until_ready(f(a0)); warm=time.perf_counter()-t0
    ts=[]
    for _ in range(m):
        a = jnp.asarray(gen()); a.block_until_ready()
        t0=time.perf_counter(); jax.block_until_ready(f(a)); ts.append(time.perf_counter()-t0)
    print(f"{label:42s} warm {warm:6.1f}s  min {min(ts)*1e3:8.2f} ms  med {sorted(ts)[m//2]*1e3:8.2f}", flush=True)

codes_np = rng.integers(0, ncat, n).astype(np.int32)
codes = jnp.asarray(codes_np); codes.block_until_ready()

g = jax.jit(lambda v, c: jnp.take(v, c))
timeit_fresh(lambda v: g(v, codes), lambda: rng.standard_normal(ncat), label="raw take(v,codes) 1M out")

cm = tm.CategoricalMatrix(codes_np, categories=np.arange(ncat)); cm.plan
timeit_fresh(lambda v: cm.matvec(v), lambda: rng.standard_normal(ncat), label="cm.matvec")

cs = jax.jit(lambda d: jnp.cumsum(d))
timeit_fresh(lambda d: cs(d), lambda: rng.random(n), label="raw cumsum 1M f64")

plan = cm.plan
timeit_fresh(lambda d: plan.sum(d), lambda: rng.random(n), label="plan.sum (gather+cumsum+diff)")

pg = jax.jit(lambda d, p: jnp.take(d, p))
perm = plan.perm
print("perm dtype", perm.dtype, "bounds dtype", plan.bounds.dtype)
timeit_fresh(lambda d: pg(d, perm), lambda: rng.random(n), label="raw take(d,perm) 1M->1M")
