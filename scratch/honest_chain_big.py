import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta
logb = int(sys.argv[1]); fused = sys.argv[2] == "fused"
block = 1 << logb
cfg = WBFMConfig(block_size=block, fused=fused, fused_backend="xla")
fg, _ = build_wbfm(cfg)
step = fg.build_step()
REPS = max(16, (256 << 20) // block)
@jax.jit
def init_all():
    states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
    t = jnp.arange(block, dtype=jnp.float32)
    x = jnp.exp(1j * (2 * jnp.pi * 10e3 / cfg.sample_rate) * t).astype(jnp.complex64)
    ins = {"iq": Stream(data=x, count=jnp.int32(block),
                        meta=StreamMeta.start(cfg.sample_rate))}
    return states, ins
states, ins = init_all()
params = fg.init_params()
def scan_chain(states):
    def body(st, _):
        st2, outs = step(st, params, ins)
        return st2, outs["audio"].count
    return jax.lax.scan(body, states, None, length=REPS)[0]
js = jax.jit(scan_chain, donate_argnums=(0,))
probe = jax.jit(lambda s: jnp.sum(jnp.abs(s["resampler"]["tail"])).astype(jnp.float32))
states = js(states)
_ = float(np.asarray(probe(states)))
for _ in range(3):
    t0 = time.time()
    states = js(states)
    chk = float(np.asarray(probe(states)))
    dt = time.time() - t0
    print(f"block=2^{logb} fused={fused}: {dt/REPS*1e6:.0f} us/block = {REPS*block/dt/1e6:.0f} Msamp/s", flush=True)
