"""Same-process comparison: resampler block vs isolated gather."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS, TAPS_TABLE
from grbaz_tpu.ops.resampler import FractionalResampler
from grbaz_tpu.core.stream import Stream, StreamMeta

N = 131072

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

rs = FractionalResampler(N, 400000.0 / 48000.0, dtype=jnp.float32)
rst = jax.tree_util.tree_map(jnp.asarray, rs.init_state())
rpr = jax.tree_util.tree_map(jnp.asarray, rs.init_params())
q = jnp.sin(0.01 * jnp.arange(N, dtype=jnp.float32))
qs = Stream(data=q, count=jnp.int32(N), meta=StreamMeta.start(400e3))
rj = jax.jit(lambda s, p, xx: rs.apply(s, p, xx))
timeit("resampler_block", rj, rst, rpr, qs)

CAP = rs.capacity
print("capacity:", CAP, flush=True)
frame = jnp.concatenate([jnp.zeros((7,), jnp.float32), q])
inc_int, inc_frac = exact.ratio_to_fixed(400000.0 / 48000.0)

@jax.jit
def full():
    idx, frac = exact.fixed_positions(CAP + 1, jnp.uint32(0), inc_int, inc_frac)
    bins = exact.frac_to_phase_bin(frac[:CAP], NSTEPS_LOG2)
    base = jnp.clip(idx[:CAP], 0, N - 1)
    taps = jnp.asarray(TAPS_TABLE)[bins]
    win_idx = base[:, None] + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]
    windows = frame[win_idx]
    return jnp.sum(windows * taps, axis=1)

timeit("isolated_full", full)

@jax.jit
def full_args(fr, mu, ii, iff):
    idx, frac = exact.fixed_positions(CAP + 1, mu, ii, iff)
    bins = exact.frac_to_phase_bin(frac[:CAP], NSTEPS_LOG2)
    base = jnp.clip(idx[:CAP], 0, N - 1)
    taps = jnp.asarray(TAPS_TABLE)[bins]
    win_idx = base[:, None] + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]
    windows = fr[win_idx]
    return jnp.sum(windows * taps, axis=1)

timeit("isolated_args", full_args, frame, jnp.uint32(0), inc_int, inc_frac)
