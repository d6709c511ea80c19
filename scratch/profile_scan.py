"""True device-time per block: lax.scan the chain step inside one jit."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

block = 1 << 20
cfg = WBFMConfig(block_size=block)
fg, handles = build_wbfm(cfg)
step = fg.build_step()
params = fg.init_params()

meta = StreamMeta.start(cfg.sample_rate)
n = block
t = jnp.arange(n, dtype=jnp.float32)
x = jnp.exp(1j * (2 * jnp.pi * 10e3 / cfg.sample_rate) * t).astype(jnp.complex64)
iq = Stream(data=x, count=jnp.int32(n), meta=meta)

K = 20

@jax.jit
def many(states, ins):
    def body(s, _):
        s2, outs = step(s, params, ins)
        return s2, jnp.sum(jnp.abs(outs["audio"].data[:4]))
    return jax.lax.scan(body, states, None, length=K)

states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
s2, chk = many(states, {"iq": iq})
jax.block_until_ready(s2)
reps = 10
t0 = time.time()
for _ in range(reps):
    s2, chk = many(states, {"iq": iq})
jax.block_until_ready(s2)
dt = (time.time() - t0) / (reps * K)
print(f"scanned chain: {dt*1e6:9.1f} us/block -> {block/dt/1e6:.0f} Msamp/s")

# trivial op dispatch baseline
y = jnp.zeros((8,), jnp.float32)
triv = jax.jit(lambda a: a + 1)
y = triv(y); jax.block_until_ready(y)
t0 = time.time()
for _ in range(100):
    y = triv(y)
jax.block_until_ready(y)
print(f"trivial jit dispatch: {(time.time()-t0)/100*1e6:.1f} us")
