import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(2)

# heavy op with physical lower bound: f32 4096^3 matmul repeated 8x = 1.1 Tflop
# v5e peak ~197 Tflop/s bf16, ~49 Tflop/s f32 -> >= ~22ms in f32
A = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32)); A.block_until_ready()
@jax.jit
def heavy(B):
    C = B
    for _ in range(8):
        C = C @ A
    return C
B0 = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32)); B0.block_until_ready()
r = heavy(B0); r.block_until_ready()  # compile

for i in range(3):
    B = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32)); B.block_until_ready()
    t0 = time.perf_counter(); y = heavy(B); y.block_until_ready(); t1 = time.perf_counter()
    s = jnp.sum(y); t2 = time.perf_counter(); sv = float(s); t3 = time.perf_counter()
    print(f"block {1e3*(t1-t0):8.2f} ms   sum+float {1e3*(t3-t2):8.2f} ms  val {sv:.3e}", flush=True)

# light op for comparison
@jax.jit
def light(B): return B + 1.0
light(B0).block_until_ready()
B = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32)); B.block_until_ready()
t0 = time.perf_counter(); light(B).block_until_ready(); print(f"light {1e3*(time.perf_counter()-t0):8.2f} ms")
