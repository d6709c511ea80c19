"""Scan-timing one stage (fresh process; usage: stage_scan.py NAME)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.ops.demod import QuadratureDemod, FMDeemphasis

which = sys.argv[1]
block = 1 << 20
cfg = WBFMConfig(block_size=block, center_freq=250e3)
fg, handles = build_wbfm(cfg)
meta = StreamMeta.start(cfg.sample_rate)
n = block
K = 16
rng = np.random.default_rng(0)

chan = handles["channel"]
resamp = handles["resampler"]
quadr = cfg.sample_rate / cfg.decim
demod = QuadratureDemod(quadr / (2 * np.pi * cfg.max_deviation))
deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)

stages = dict(
    chan=(chan, n, np.complex64),
    demod=(demod, n // 8, np.complex64),
    resamp=(resamp, n // 8, np.float32),
    deemph=(deemph, resamp.capacity, np.float32),
)
blockobj, m, dt_ = stages[which]
if dt_ == np.complex64:
    x = jnp.asarray((rng.standard_normal(m, np.float32)
                     + 1j * rng.standard_normal(m, np.float32)).astype(np.complex64))
else:
    x = jnp.asarray(rng.standard_normal(m, np.float32).astype(np.float32))
st = jax.tree_util.tree_map(jnp.asarray, blockobj.init_state())
pr = blockobj.init_params()
scales = jnp.asarray(1.0 + np.arange(K, dtype=np.float32) * 1e-6)

@jax.jit
def many(st, x, scales):
    def body(st, sc):
        s2, outs = blockobj.apply(st, pr, Stream(x * sc, jnp.int32(m), meta))
        return s2, jnp.sum(jnp.abs(outs[0].data[:4]))
    c, o = jax.lax.scan(body, st, scales)
    return c, jnp.sum(o)

c, o = many(st, x, scales)
print(f"{which} chk: {float(o):.5g}", flush=True)
reps = 10
t0 = time.time()
for _ in range(reps):
    c, o = many(st, x, scales)
    _ = float(o)
dt = (time.time() - t0) / (reps * K)
print(f"{which}: {dt*1e6:9.1f} us/block ({m} samples)")
