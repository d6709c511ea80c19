import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

variants = {}
for logb in (23, 24, 25):
    block = 1 << logb
    cfg = WBFMConfig(block_size=block, fused=True, fused_precision="default")
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()
    t = jnp.arange(block, dtype=jnp.float32)
    x = jnp.exp(1j * (2 * jnp.pi * 10e3 / cfg.sample_rate) * t).astype(jnp.complex64)
    ins = {"iq": Stream(data=x, count=jnp.int32(block),
                        meta=StreamMeta.start(cfg.sample_rate))}
    states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
    params = jax.tree_util.tree_map(jnp.asarray, fg.init_params())
    jit_step = jax.jit(step)
    o = jit_step(states, params, ins); jax.block_until_ready(o)
    variants[logb] = (jit_step, states, params, ins, [], block)

rounds = 6
for r in range(rounds):
    for logb, (f, st, pr, ins, samples, block) in variants.items():
        reps = max(1, (200 << 20) // block)
        t0 = time.time()
        o = None
        for _ in range(reps):
            o = f(st, pr, ins)
        jax.block_until_ready(o)
        samples.append(reps * block / (time.time() - t0) / 1e6)

for logb, (_, _, _, _, s, block) in variants.items():
    s.sort()
    print(f"block=2^{logb}: median={s[len(s)//2]:.0f} best={s[-1]:.0f} Msamp/s", flush=True)
