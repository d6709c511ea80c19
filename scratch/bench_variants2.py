"""Interleaved WBFM variant comparison (tunnel-noise-resistant)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

block = 1 << 20
variants = {}
for name, kw in [("xla", dict(fused=False)),
                 ("pallas-high", dict(fused=True, fused_precision="high")),
                 ("pallas-default", dict(fused=True, fused_precision="default"))]:
    cfg = WBFMConfig(block_size=block, **kw)
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()
    n = cfg.block_size
    t = jnp.arange(n, dtype=jnp.float32)
    x = jnp.exp(1j * (2 * jnp.pi * 10e3 / cfg.sample_rate) * t).astype(jnp.complex64)
    ins = {"iq": Stream(data=x, count=jnp.int32(n),
                        meta=StreamMeta.start(cfg.sample_rate))}
    states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
    params = jax.tree_util.tree_map(jnp.asarray, fg.init_params())
    jit_step = jax.jit(step)
    o = jit_step(states, params, ins)
    jax.block_until_ready(o)
    variants[name] = (jit_step, states, params, ins, [])

reps, rounds = 200, 6
for r in range(rounds):
    for name, (f, st, pr, ins, samples) in variants.items():
        t0 = time.time()
        o = None
        for _ in range(reps):
            o = f(st, pr, ins)
        jax.block_until_ready(o)
        samples.append(reps * block / (time.time() - t0) / 1e6)

for name, (_, _, _, _, s) in variants.items():
    s.sort()
    print(f"{name}: median={s[len(s)//2]:.0f} best={s[-1]:.0f} worst={s[0]:.0f} Msamp/s",
          flush=True)
