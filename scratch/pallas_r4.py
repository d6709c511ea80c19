"""Time the v2 Pallas channelizer on real TPU, verbose milestones."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from grbaz_tpu.ops.fir import low_pass_taps, prepare_taps
from grbaz_tpu.ops.pallas import wbfm_frontend as wf

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
PREC = sys.argv[2] if len(sys.argv) > 2 else "high"
block = 1 << 20
fs = 3.2e6
taps = low_pass_taps(1.0, fs, 112.5e3, 75e3)
h = prepare_taps(taps, 8)
tpad = int(h.shape[0])
log = lambda m: print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

log(f"start reps={REPS} prec={PREC} tpad={tpad}")


@jax.jit
def init():
    t = jnp.arange(tpad + block, dtype=jnp.float32)
    return jnp.exp(1j * 0.01 * t).astype(jnp.complex64)


def one(frame, inc):
    yf = wf.xlating_fir_frame_pallas(frame[1:], h, 8, inc, precision=PREC)
    return yf


def scan_fn(c):
    frame, acc = c
    def body(cc, _):
        fr, a = cc
        yf = one(fr, jnp.uint32(123456789))
        osum = (jnp.sum(yf.real) + jnp.sum(yf.imag)).astype(jnp.float32)
        fr2 = fr + (0.0 * osum).astype(fr.dtype)
        return (fr2, a + osum), ()
    return jax.lax.scan(body, (frame, acc), None, length=REPS)[0]


js = jax.jit(scan_fn)
probe = jax.jit(lambda c: c[1] + jnp.sum(jnp.abs(c[0][:4])))

t0 = time.time()
frame = init()
jax.block_until_ready(frame)
log(f"init done {time.time()-t0:.1f}s")

t0 = time.time()
lowered = js.lower(((frame, jnp.float32(0))))
log(f"traced {time.time()-t0:.1f}s")
t0 = time.time()
compiled = lowered.compile()
log(f"compiled {time.time()-t0:.1f}s")

t0 = time.time()
c = compiled((frame, jnp.float32(0)))
chk = float(np.asarray(probe(c)))
log(f"first run+fetch {time.time()-t0:.1f}s chk={chk:.4g}")

rtts = []
for _ in range(3):
    t0 = time.time()
    _ = float(np.asarray(probe(c)))
    rtts.append(time.time() - t0)
rtt = sorted(rtts)[1]

res = []
for _ in range(5):
    t0 = time.time()
    c = compiled((c[0], c[1]))
    chk = float(np.asarray(probe(c)))
    res.append((time.time() - t0 - rtt) / REPS * 1e6)
res.sort()
log(f"chan_pallas({PREC}): {res[len(res)//2]:.1f} us/block "
    f"(min {res[0]:.1f} max {res[-1]:.1f}, rtt {rtt*1e3:.0f}ms)")
