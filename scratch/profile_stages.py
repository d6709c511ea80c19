"""Per-stage timing of the WBFM chain on the real chip."""
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

# Build individual stage steps
from grbaz_tpu.ops.demod import QuadratureDemod, FMDeemphasis
from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator, low_pass_taps
from grbaz_tpu.ops.resampler import FractionalResampler

fs, decim = cfg.sample_rate, cfg.decim
quad = fs / decim
chan = handles["channel"]
resamp = handles["resampler"]
demod = QuadratureDemod(quad / (2 * np.pi * cfg.max_deviation))
deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)

meta = StreamMeta.start(cfg.sample_rate)
n = block
t = jnp.arange(n, dtype=jnp.float32)
x = jnp.exp(1j * (2 * jnp.pi * 10e3 / fs) * t).astype(jnp.complex64)
iq = Stream(data=x, count=jnp.int32(n), meta=meta)


def timeit(name, f, state, params, ins, reps=30):
    jf = jax.jit(f)
    s, outs = jf(state, params, ins)
    jax.block_until_ready(s)
    t0 = time.time()
    for _ in range(reps):
        s, outs = jf(state, params, ins)
    jax.block_until_ready(s)
    dt = (time.time() - t0) / reps
    print(f"{name:26s} {dt*1e6:9.1f} us")
    return outs


def tomap(b):
    st = jax.tree_util.tree_map(jnp.asarray, b.init_state())
    pr = jax.tree_util.tree_map(jnp.asarray, b.init_params())
    return st, pr

st, pr = tomap(chan)
outs = timeit("channelizer", lambda s, p, i: chan.apply(s, p, i), st, pr, iq)
quad_stream = outs[0]
st, pr = tomap(demod)
outs = timeit("quad_demod", lambda s, p, i: demod.apply(s, p, i), st, pr, quad_stream)
d_stream = outs[0]
st, pr = tomap(resamp)
outs = timeit("resampler", lambda s, p, i: resamp.apply(s, p, i), st, pr, d_stream)
r_stream = outs[0]
st, pr = tomap(deemph)
outs = timeit("deemphasis", lambda s, p, i: deemph.apply(s, p, i), st, pr, r_stream)

# whole chain for reference
step = fg.build_step()
states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
params = fg.init_params()
jstep = jax.jit(step, donate_argnums=(0,))
states, o = jstep(states, params, {"iq": iq})
jax.block_until_ready(states)
t0 = time.time()
reps = 30
for _ in range(reps):
    states, o = jstep(states, params, {"iq": iq})
jax.block_until_ready(states)
dt = (time.time() - t0) / reps
print(f"{'WHOLE CHAIN':26s} {dt*1e6:9.1f} us  -> {block/dt/1e6:.0f} Msamp/s")
