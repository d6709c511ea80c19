"""Resampler formulation shoot-out on real TPU. argv[1] = variant.

Variants (all produce identical outputs; timed with the carried-input
scan + forced-fetch fence):
  v0    current resample_block (elementwise window gather [cap, 8])
  v1    pre-windowed [n, 8] matrix + single-axis row gather
  v2    v1 + MMSE taps via one-hot matmul instead of table row gather
  v5    position/bin machinery only (no interpolation) — floor cost
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS, TAPS_TABLE
from grbaz_tpu.ops.resampler import resample_block

HIST = NTAPS - 1
variant = sys.argv[1]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
N = (1 << 20) // 8
RATIO = 400e3 / 48e3
CAP = int(np.ceil(N / (RATIO * 0.9))) + 1
INC_I, INC_F = exact.ratio_to_fixed(RATIO)


def positions(cap, mu_int, mu_frac):
    idx, frac = exact.fixed_positions(cap + 1, mu_frac, INC_I, INC_F)
    idx = idx + mu_int
    valid = idx[:cap] <= jnp.int32(N) - 1
    n_out = jnp.sum(valid.astype(jnp.int32))
    bins = exact.frac_to_phase_bin(frac[:cap], NSTEPS_LOG2)
    base = jnp.clip(idx[:cap], 0, N - 1)
    new_mu_int = idx[n_out] - jnp.int32(N)
    new_mu_frac = frac[n_out]
    return base, bins, valid, n_out, new_mu_int, new_mu_frac


def v0(frame, mu_int, mu_frac):
    y, n_out, mi, mf = resample_block(frame, mu_int, mu_frac,
                                      jnp.int32(INC_I), jnp.uint32(INC_F),
                                      CAP, TAPS_TABLE)
    return y, mi, mf


def v1(frame, mu_int, mu_frac):
    base, bins, valid, n_out, mi, mf = positions(CAP, mu_int, mu_frac)
    taps = jnp.asarray(TAPS_TABLE)[bins]
    l = frame.shape[0] - HIST
    w_all = jnp.stack([frame[t:t + l] for t in range(NTAPS)], axis=1)
    windows = w_all[base]
    y = jnp.sum(windows * taps, axis=1)
    y = jnp.where(valid, y, 0.0)
    return y, mi, mf


def v2(frame, mu_int, mu_frac):
    base, bins, valid, n_out, mi, mf = positions(CAP, mu_int, mu_frac)
    onehot = (bins[:, None] == jnp.arange(TAPS_TABLE.shape[0],
                                          dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
    taps = jnp.dot(onehot, jnp.asarray(TAPS_TABLE),
                   precision=jax.lax.Precision.HIGHEST)
    l = frame.shape[0] - HIST
    w_all = jnp.stack([frame[t:t + l] for t in range(NTAPS)], axis=1)
    windows = w_all[base]
    y = jnp.sum(windows * taps, axis=1)
    y = jnp.where(valid, y, 0.0)
    return y, mi, mf


def v5(frame, mu_int, mu_frac):
    base, bins, valid, n_out, mi, mf = positions(CAP, mu_int, mu_frac)
    y = (base.astype(jnp.float32) + bins.astype(jnp.float32)
         ) * frame[0] * 1e-9
    y = jnp.where(valid, y, 0.0)
    return y, mi, mf


def v6(frame, mu_int, mu_frac):
    from grbaz_tpu.ops.resampler import resample_block_rational
    y, n_out, mi, mf = resample_block_rational(
        frame, mu_int, mu_frac, jnp.int32(INC_I), jnp.uint32(INC_F),
        CAP, TAPS_TABLE, 25, 3)
    return y, mi, mf


fn = dict(v0=v0, v1=v1, v2=v2, v5=v5, v6=v6)[variant]


@jax.jit
def init():
    t = jnp.arange(HIST + N, dtype=jnp.float32)
    return jnp.sin(0.01 * t), jnp.int32(HIST), jnp.uint32(0)


def scan_fn(carry):
    def body(c, _):
        frame, mi, mf, acc = c
        y, mi2, mf2 = fn(frame, mi, mf)
        osum = jnp.sum(y).astype(jnp.float32)
        frame2 = frame + (0.0 * osum)
        return (frame2, mi2, mf2, acc + osum), ()
    return jax.lax.scan(body, carry, None, length=REPS)[0]


js = jax.jit(scan_fn)
probe = jax.jit(lambda c: c[3] + jnp.sum(c[0][:8]))

frame, mi, mf = init()
t0 = time.time()
c = js((frame, mi, mf, jnp.float32(0)))
chk = float(np.asarray(probe(c)))
print(f"# {variant}: compile+warm {time.time()-t0:.1f}s chk={chk:.4g}",
      file=sys.stderr, flush=True)

rtts = []
for _ in range(3):
    t0 = time.time()
    _ = float(np.asarray(probe(c)))
    rtts.append(time.time() - t0)
rtt = sorted(rtts)[1]

res = []
for _ in range(5):
    t0 = time.time()
    c = js((c[0], mi, mf, c[3]))
    chk = float(np.asarray(probe(c)))
    res.append((time.time() - t0 - rtt) / REPS * 1e6)
res.sort()
print(f"{variant}: {res[len(res)//2]:.1f} us/block "
      f"(min {res[0]:.1f} max {res[-1]:.1f}, rtt {rtt*1e3:.0f}ms)",
      flush=True)
