import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS, TAPS_TABLE
N = 131072; CAP = 31459
frame = jnp.zeros((N+7,), jnp.float32)
ii, iff = exact.ratio_to_fixed(400000.0/48000.0)
print("types:", type(ii), type(iff))
ii_d, iff_d = jnp.asarray(ii), jnp.asarray(iff)
mu_d = jnp.asarray(np.uint32(0))

def full_args(fr, mu, ii, iff):
    idx, frac = exact.fixed_positions(CAP + 1, mu, ii, iff)
    bins = exact.frac_to_phase_bin(frac[:CAP], NSTEPS_LOG2)
    base = jnp.clip(idx[:CAP], 0, N - 1)
    taps = jnp.asarray(TAPS_TABLE)[bins]
    win_idx = base[:, None] + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]
    windows = fr[win_idx]
    return jnp.sum(windows * taps, axis=1)
f = jax.jit(full_args)

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

timeit("host_scalar_args", f, frame, np.uint32(0), ii, iff)
timeit("device_args", f, frame, mu_d, ii_d, iff_d)
