import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS, TAPS_TABLE
from grbaz_tpu.ops.resampler import FractionalResampler
from grbaz_tpu.core.stream import Stream, StreamMeta
N = 131072
rs = FractionalResampler(N, 400000.0/48000.0, dtype=jnp.float32)
rst = jax.tree_util.tree_map(jnp.asarray, rs.init_state())
rpr = jax.tree_util.tree_map(jnp.asarray, rs.init_params())
q = jnp.zeros((N,), jnp.float32)
qs = Stream(data=q, count=jnp.int32(N), meta=StreamMeta.start(400e3))
CAP = rs.capacity
frame = jnp.zeros((N+7,), jnp.float32)
inc_int, inc_frac = exact.ratio_to_fixed(400000.0/48000.0)

def full_args(fr, mu, ii, iff):
    idx, frac = exact.fixed_positions(CAP + 1, mu, ii, iff)
    bins = exact.frac_to_phase_bin(frac[:CAP], NSTEPS_LOG2)
    base = jnp.clip(idx[:CAP], 0, N - 1)
    taps = jnp.asarray(TAPS_TABLE)[bins]
    win_idx = base[:, None] + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]
    windows = fr[win_idx]
    return jnp.sum(windows * taps, axis=1)

t1 = jax.jit(lambda s,p,xx: rs.apply(s,p,xx)).lower(rst, rpr, qs).compile().as_text()
t2 = jax.jit(full_args).lower(frame, jnp.uint32(0), inc_int, inc_frac).compile().as_text()
for name, t in (("block", t1), ("isolated", t2)):
    print("=====", name, "gather lines:")
    for line in t.splitlines():
        if "gather" in line or "dynamic-slice" in line.lower():
            print("  ", line.strip()[:200])
