"""Honest device-time: scan over per-iteration lo_inc params (input block
stays resident; nothing is loop-invariant downstream of the rotate)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

block = 1 << 20
cfg = WBFMConfig(block_size=block, center_freq=250e3)
fg, handles = build_wbfm(cfg)
step = fg.build_step()
params = fg.init_params()
cname = handles["channel"].name

meta = StreamMeta.start(cfg.sample_rate)
n = block
rng = np.random.default_rng(0)
x = jnp.asarray((rng.standard_normal(n, np.float32)
                 + 1j * rng.standard_normal(n, np.float32)).astype(np.complex64))

K = 16
lo_incs = jnp.asarray(np.arange(1, K + 1, dtype=np.uint32) * 7919)

@jax.jit
def many(states, x, lo_incs):
    ins = {"iq": Stream(data=x, count=jnp.int32(n), meta=meta)}
    def body(s, inc):
        p2 = dict(params)
        p2[cname] = dict(params[cname], lo_inc=inc)
        s2, outs = step(s, p2, ins)
        return s2, jnp.sum(jnp.abs(outs["audio"].data[:4]))
    c, o = jax.lax.scan(body, states, lo_incs)
    return c, jnp.sum(o)

states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
c, o = many(states, x, lo_incs)
print("chk:", float(o), flush=True)
reps = 10
t0 = time.time()
for _ in range(reps):
    c, o = many(states, x, lo_incs)
    _ = float(o)
dt = (time.time() - t0) / (reps * K)
print(f"WHOLE CHAIN (scan, honest): {dt*1e6:9.1f} us/block -> {block/dt/1e6:7.0f} Msamp/s")
