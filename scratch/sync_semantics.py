"""What does block_until_ready actually await through the relay?

A: time N chained steps + block_until_ready, then time the probe fetch.
   If the fetch after block_until_ready still takes ~N*step_cost, the
   relay acked without executing. Also compare donation vs no-donation.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

block = 1 << 20
cfg = WBFMConfig(block_size=block, fused=True, fused_precision="default")
fg, _ = build_wbfm(cfg)
step = fg.build_step()

@jax.jit
def init_all():
    states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
    t = jnp.arange(block, dtype=jnp.float32)
    x = jnp.exp(1j * (2 * jnp.pi * 10e3 / cfg.sample_rate) * t
                ).astype(jnp.complex64)
    ins = {"iq": Stream(data=x, count=jnp.int32(block),
                        meta=StreamMeta.start(cfg.sample_rate))}
    return states, ins

states, ins = init_all()
params = fg.init_params()
jit_nodon = jax.jit(step)
probe = jax.jit(lambda s: jnp.sum(jnp.abs(s["resampler"]["tail"])
                                  ).astype(jnp.float32))
states, outs = jit_nodon(states, params, ins)
_ = float(np.asarray(probe(states)))

N = 100
t0 = time.time()
for _ in range(N):
    states, outs = jit_nodon(states, params, ins)
jax.block_until_ready(states)
t1 = time.time()
chk = float(np.asarray(probe(states)))
t2 = time.time()
print(f"no-donate: {N} steps+block_until_ready = {(t1-t0)*1e3:.1f} ms; "
      f"fetch after = {(t2-t1)*1e3:.1f} ms", flush=True)

# again, already-forced state: fetch should now be pure RTT
t3 = time.time()
chk = float(np.asarray(probe(states)))
t4 = time.time()
print(f"second fetch (pure RTT): {(t4-t3)*1e3:.1f} ms", flush=True)
