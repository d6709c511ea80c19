"""Compare WBFM chain variants on the real TPU: XLA vs fused Pallas."""
import os, sys, time
sys.path.insert(0, "/root/repo")
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

block = 1 << 20

def run(name, **kw):
    cfg = WBFMConfig(block_size=block, **kw)
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()
    def make_ins():
        n = cfg.block_size
        t = jnp.arange(n, dtype=jnp.float32)
        x = jnp.exp(1j * (2 * jnp.pi * (cfg.center_freq + 10e3)
                          / cfg.sample_rate) * t).astype(jnp.complex64)
        meta = StreamMeta.start(cfg.sample_rate)
        return {"iq": Stream(data=x, count=jnp.int32(n), meta=meta)}
    @jax.jit
    def init_all():
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        return states, make_ins()
    jit_step = jax.jit(step, donate_argnums=(0,))
    params = fg.init_params()
    states, ins = init_all()
    jax.block_until_ready(states)
    states, outs = jit_step(states, params, ins)
    jax.block_until_ready(states)
    reps, trials = 30, 5
    samples = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            states, outs = jit_step(states, params, ins)
        jax.block_until_ready(states)
        samples.append(reps * block / (time.time() - t0) / 1e6)
    samples.sort()
    print(f"{name}: median={samples[len(samples)//2]:.0f} min={samples[0]:.0f} max={samples[-1]:.0f} Msamp/s", flush=True)

run("xla", fused=False)
run("pallas-high(=HIGHEST)", fused=True, fused_precision="high")
run("pallas-default", fused=True, fused_precision="default")
