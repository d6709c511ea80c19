import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
x = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB
f = jax.jit(lambda a: a * 1.000001 + 0.5)
o = f(x); jax.block_until_ready(o)
for reps in (4, 16):
    t0 = time.time()
    for _ in range(reps):
        o = f(x)
    jax.block_until_ready(o)
    dt = time.time() - t0
    print(f"reps={reps}: {reps*2*256/dt/1024:.2f} GB/s eff, {dt/reps*1e6:.0f} us/iter", flush=True)
# matmul flops check
a = jnp.ones((8192, 8192), jnp.bfloat16)
g = jax.jit(lambda m: m @ m)
o = g(a); jax.block_until_ready(o)
t0 = time.time()
for _ in range(8):
    o = g(o)
jax.block_until_ready(o)
dt = time.time() - t0
print(f"matmul: {8*2*8192**3/dt/1e12:.1f} TFLOP/s", flush=True)
