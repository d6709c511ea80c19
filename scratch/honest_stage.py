"""Honest per-stage timing: scan + forced fetch. argv[1] selects stage."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.core.stream import Stream, StreamMeta

stage = sys.argv[1]
block = 1 << 20
fs = 3.2e6
REPS = 128

if stage == "frontend":
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm, WBFMFrontend
    from grbaz_tpu.ops.fir import low_pass_taps
    cfg = WBFMConfig(block_size=block)
    blk = WBFMFrontend(
        low_pass_taps(1.0, fs, cfg.channel_width / 2 + cfg.transition / 2,
                      cfg.transition),
        cfg.decim, 0.0, fs, 1.0, squelch_db=cfg.squelch_db,
        precision="default")
    n = block
    mk = lambda: Stream(data=jnp.exp(1j * 0.01 * jnp.arange(n, dtype=jnp.float32)).astype(jnp.complex64),
                        count=jnp.int32(n), meta=StreamMeta.start(fs))
    probe_key = "tail"
elif stage == "frontend_xla":
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm, WBFMFrontend
    from grbaz_tpu.ops.fir import low_pass_taps
    cfg = WBFMConfig(block_size=block)
    blk = WBFMFrontend(
        low_pass_taps(1.0, fs, cfg.channel_width / 2 + cfg.transition / 2,
                      cfg.transition),
        cfg.decim, 0.0, fs, 1.0, squelch_db=cfg.squelch_db,
        backend="xla")
    n = block
    mk = lambda: Stream(data=jnp.exp(1j * 0.01 * jnp.arange(n, dtype=jnp.float32)).astype(jnp.complex64),
                        count=jnp.int32(n), meta=StreamMeta.start(fs))
    probe_key = "tail"
elif stage == "resampler":
    from grbaz_tpu.ops.resampler import FractionalResampler
    n = block // 8
    blk = FractionalResampler(n, (fs / 8) / 48e3, dtype=jnp.float32)
    mk = lambda: Stream(data=jnp.sin(0.01 * jnp.arange(n, dtype=jnp.float32)),
                        count=jnp.int32(n), meta=StreamMeta.start(fs / 8))
    probe_key = "tail"
elif stage == "deemph":
    from grbaz_tpu.models.wbfm import FMDeemphasis
    n = 15729
    blk = FMDeemphasis(48e3, 75e-6)
    mk = lambda: Stream(data=jnp.sin(0.01 * jnp.arange(n, dtype=jnp.float32)),
                        count=jnp.int32(n), meta=StreamMeta.start(48e3))
    probe_key = None

@jax.jit
def init_all():
    st = jax.tree_util.tree_map(jnp.asarray, blk.init_state())
    return st, mk()

st, xs = init_all()
pr = blk.init_params()

def scan_stage(st, pr, xs):
    def body(s, _):
        s2, (out,) = blk.apply(s, pr, xs)
        return s2, out.count
    return jax.lax.scan(body, st, None, length=REPS)

js = jax.jit(scan_stage, donate_argnums=(0,))
def mkprobe(s):
    leaves = [l for l in jax.tree_util.tree_leaves(s)
              if hasattr(l, "dtype")]
    acc = jnp.float32(0)
    for l in leaves:
        acc = acc + jnp.sum(jnp.abs(l).astype(jnp.float32))
    return acc
probe = jax.jit(mkprobe)

st, counts = js(st, pr, xs)
_ = float(np.asarray(probe(st)))
for _ in range(3):
    t0 = time.time()
    st, counts = js(st, pr, xs)
    chk = float(np.asarray(probe(st)))
    dt = time.time() - t0
    print(f"{stage}: {dt/REPS*1e6:.1f} us/block", flush=True)
