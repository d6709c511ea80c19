import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.core.stream import Stream, StreamMeta

block = 1 << 15
rng = np.random.default_rng(7)
x = [(rng.standard_normal(block) + 1j * rng.standard_normal(block))
     .astype(np.complex64) for _ in range(3)]

outs = {}
for fused in (False, True):
    cfg = WBFMConfig(block_size=block, center_freq=250e3, squelch_db=-20)
    cfg.fused = fused
    fg, _ = build_wbfm(cfg)
    step = jax.jit(fg.build_step())
    states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
    params = fg.init_params()
    meta = StreamMeta.start(cfg.sample_rate)
    audio = []
    quad = []
    for xb in x:
        states, o = step(states, params,
                         {"iq": Stream(jnp.asarray(xb), jnp.int32(block), meta)})
        a = np.asarray(o["audio"].data)[: int(o["audio"].count)]
        audio.append(a)
        q = np.asarray(o["quad"].data)[: int(o["quad"].count)]
        quad.append(q)
    outs[fused] = (np.concatenate(audio), np.concatenate(quad))

a0, q0 = outs[False]
a1, q1 = outs[True]
print("audio len", len(a0), len(a1))
# skip the 1-sample cold-start difference (prev init convention)
d = np.abs(q0[1:] - q1[1:])
print("quad max abs diff (skip s0):", d.max(), "std:", q0.std())
d = np.abs(a0[2:] - a1[2:])
print("audio max abs diff:", d.max(), "std:", a0.std())
snr = 10*np.log10(np.mean(a0[2:]**2) / max(np.mean((a0[2:]-a1[2:])**2), 1e-30))
print("audio SNR fused-vs-unfused: %.1f dB" % snr)
