import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

which = sys.argv[1]
REPS = 64
if which == "matmul":
    M = 4096
    x0 = jnp.ones((M, M), jnp.bfloat16) * 0.001
    w = jnp.ones((M, M), jnp.bfloat16) * 0.001
    def fn(c):
        y = jnp.dot(c, w, preferred_element_type=jnp.float32)
        return (y * 1e-6).astype(jnp.bfloat16)
    flops_per = 2 * M**3
elif which == "hbm":
    N = 32 * 1024 * 1024   # 128 MB f32
    x0 = jnp.ones((N,), jnp.float32)
    def fn(c):
        return c * 1.0000001 + 1e-12
    flops_per = None
    bytes_per = 2 * N * 4

def scan_fn(x):
    def body(c, _):
        return fn(c), ()
    return jax.lax.scan(body, x, None, length=REPS)[0]
js = jax.jit(scan_fn)
probe = jax.jit(lambda x: jnp.sum(jnp.abs(x).astype(jnp.float32)))
x0 = js(x0); _ = float(np.asarray(probe(x0)))
best = 1e9
for _ in range(3):
    t0 = time.time()
    x0 = js(x0)
    _ = float(np.asarray(probe(x0)))
    best = min(best, (time.time()-t0)/REPS)
if which == "matmul":
    print(f"matmul: {flops_per/best/1e12:.2f} TFLOP/s ({best*1e6:.0f} us/iter)", flush=True)
else:
    print(f"hbm: {bytes_per/best/1e9:.1f} GB/s ({best*1e6:.0f} us/iter)", flush=True)
