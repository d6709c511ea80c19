"""Break down resampler cost on TPU: ramp vs taps-gather vs window-gather."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS, TAPS_TABLE

N = 131072
CAP = 31460
frame = jnp.asarray(np.random.randn(N + 7).astype(np.float32))
mu_frac = jnp.uint32(0)
inc_int, inc_frac = exact.ratio_to_fixed(400000.0 / 48000.0)

def timeit(name, fn, *args, reps=200, trials=5):
    o = fn(*args); jax.block_until_ready(o)
    best = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            o = fn(*args)
        jax.block_until_ready(o)
        best.append((time.time() - t0) / reps * 1e6)
    best.sort()
    print(f"{name}: {best[len(best)//2]:.1f} us", flush=True)

@jax.jit
def ramp():
    idx, frac = exact.fixed_positions(CAP + 1, mu_frac, inc_int, inc_frac)
    return idx, frac

idx0, frac0 = ramp()
bins0 = exact.frac_to_phase_bin(frac0[:CAP], NSTEPS_LOG2)
base0 = jnp.clip(idx0[:CAP], 0, N - 1)

@jax.jit
def taps_gather(bins):
    return jnp.asarray(TAPS_TABLE)[bins]

@jax.jit
def win_gather(base):
    win_idx = base[:, None] + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]
    return frame[win_idx]

@jax.jit
def win_gather_cols(base):
    cols = [jnp.take(frame, base + t) for t in range(NTAPS)]
    return jnp.stack(cols, axis=1)

@jax.jit
def full(base, bins):
    taps = jnp.asarray(TAPS_TABLE)[bins]
    win_idx = base[:, None] + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]
    windows = frame[win_idx]
    return jnp.sum(windows * taps, axis=1)

timeit("ramp(cumsum)", ramp)
timeit("taps_gather", taps_gather, bins0)
timeit("win_gather2d", win_gather, base0)
timeit("win_gather_cols", win_gather_cols, base0)
timeit("full", full, base0, bins0)
