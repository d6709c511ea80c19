"""Honest chain timing: dependency-chained reps + forced f32 scalar fetch.

One program per process (pass block log2 as argv[1]). All compute jitted;
probe is an f32 scalar fetched with np.asarray (the only reliable
transfer dtype through the tunnel).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

logb = int(sys.argv[1]) if len(sys.argv) > 1 else 20
block = 1 << logb
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
jit_step = jax.jit(step, donate_argnums=(0,))
probe = jax.jit(lambda s: jnp.sum(jnp.abs(s["resampler"]["tail"])
                                  ).astype(jnp.float32))

states, outs = jit_step(states, params, ins)
_ = float(np.asarray(probe(states)))
print("warm; measuring fetch RTT ...", flush=True)
rtts = []
for _ in range(5):
    t0 = time.time()
    _ = float(np.asarray(probe(states)))
    rtts.append(time.time() - t0)
print(f"fetch RTT: min {min(rtts)*1e3:.1f} ms median {sorted(rtts)[2]*1e3:.1f} ms",
      flush=True)

for reps in (50, 200, 800):
    t0 = time.time()
    for _ in range(reps):
        states, outs = jit_step(states, params, ins)
    chk = float(np.asarray(probe(states)))
    dt = time.time() - t0
    print(f"block=2^{logb} reps={reps}: total={dt*1e3:.1f} ms, "
          f"{dt/reps*1e6:.1f} us/block, {reps*block/dt/1e6:.0f} Msamp/s",
          flush=True)
