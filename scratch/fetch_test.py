import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
x = jnp.ones((1024,), jnp.float32)
s = jax.jit(jnp.sum)(x)
print("scalar fetch:", float(np.asarray(s)), flush=True)
big = jax.jit(lambda a: a * 2)(x)
print("vec fetch:", np.asarray(big)[:2], flush=True)
st = {"tail": jnp.ones((7,), jnp.complex64)}
pr = jax.jit(lambda d: jnp.sum(jnp.abs(d["tail"])))(st)
print("complex-abs fetch:", float(np.asarray(pr)), flush=True)
