"""True device-time per block: scan with DISTINCT per-iteration inputs
(prevents loop-invariant hoisting), plus per-stage scanned timings."""
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
cfg = WBFMConfig(block_size=block, center_freq=250e3)
fg, handles = build_wbfm(cfg)
step = fg.build_step()
params = fg.init_params()

meta = StreamMeta.start(cfg.sample_rate)
n = block
K = 16
rng = np.random.default_rng(0)
xs_np = (rng.standard_normal((K, n), np.float32)
         + 1j * rng.standard_normal((K, n), np.float32)).astype(np.complex64)
xs = jnp.asarray(xs_np)
jax.block_until_ready(xs)


def scan_time(name, body_fn, init_carry, reps=8):
    @jax.jit
    def many(carry, xs):
        c, o = jax.lax.scan(body_fn, carry, xs)
        return c, jnp.sum(o)
    import numpy as _np
    c, o = many(init_carry, xs)
    _ = float(o)
    t0 = time.time()
    for _i in range(reps):
        c, o = many(init_carry, xs)
        _ = float(o)
    dt = (time.time() - t0) / (reps * K)
    print(f"{name:26s} {dt*1e6:9.1f} us/block -> {block/dt/1e6:7.0f} Msamp/s (chk {_:.3g})")
    return dt


def chain_body(states, xk):
    ins = {"iq": Stream(data=xk, count=jnp.int32(n), meta=meta)}
    s2, outs = step(states, params, ins)
    return s2, jnp.sum(jnp.abs(outs["audio"].data[:4]))

states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
scan_time("WHOLE CHAIN", chain_body, states)

# per stage
from grbaz_tpu.ops.demod import QuadratureDemod, FMDeemphasis

chan = handles["channel"]
resamp = handles["resampler"]
quad = cfg.sample_rate / cfg.decim
demod = QuadratureDemod(quad / (2 * np.pi * cfg.max_deviation))
deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)


def tomap(b):
    st = jax.tree_util.tree_map(jnp.asarray, b.init_state())
    pr = b.init_params()  # keep numpy: axon can't fetch for ir_constant
    return st, pr


def stage_body(blockobj, pr, mkstream):
    def body(st, xk):
        s2, outs = blockobj.apply(st, pr, mkstream(xk))
        return s2, jnp.sum(jnp.abs(outs[0].data[:4]))
    return body

st, pr = tomap(chan)
scan_time("channelizer", stage_body(chan, pr, lambda xk: Stream(xk, jnp.int32(n), meta)), st)

# decimated stream inputs for downstream stages
xs_q = xs[:, : n // 8]
def scan_time_q(name, body_fn, init_carry, data, reps=8):
    @jax.jit
    def many(carry, d):
        c, o = jax.lax.scan(body_fn, carry, d)
        return c, jnp.sum(o)
    import numpy as _np
    c, o = many(init_carry, data)
    _ = float(o)
    t0 = time.time()
    for _i in range(reps):
        c, o = many(init_carry, data)
        _ = float(o)
    dt = (time.time() - t0) / (reps * K)
    print(f"{name:26s} {dt*1e6:9.1f} us/block (chk {_:.3g})")
    return dt

nq = n // 8
st, pr = tomap(demod)
scan_time_q("quad_demod (131k)", stage_body(demod, pr, lambda xk: Stream(xk, jnp.int32(nq), meta)), st, xs_q)
st, pr = tomap(resamp)
scan_time_q("resampler (131k->15.7k)", stage_body(resamp, pr, lambda xk: Stream(xk.real, jnp.int32(nq), meta)), st, xs_q)
xs_a = xs[:, : resamp.capacity].real
st, pr = tomap(deemph)
scan_time_q("deemphasis (31k)", stage_body(deemph, pr, lambda xk: Stream(xk, jnp.int32(xk.shape[0]), meta)), st, xs_a)
