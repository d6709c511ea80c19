import sys; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import time, numpy as np, jax.numpy as jnp
from grbaz_tpu.ops.fir import prepare_taps, low_pass_taps, xlating_fir_decimate_frame
from grbaz_tpu.ops.pallas.wbfm_frontend import (
    xlating_fir_frame_pallas, rotate_output, demod_unrotated)
from grbaz_tpu.ops.demod import quadrature_demod
import grbaz_tpu.ops.exact as exact

decim = 8
taps = low_pass_taps(1.0, 3.2e6, 100e3, 75e3)
h = prepare_taps(taps, decim)
tpad = h.shape[0]
n_new = 8192 * decim
rng = np.random.default_rng(42)
frame = jnp.asarray((rng.standard_normal(n_new + tpad - 1)
    + 1j * rng.standard_normal(n_new + tpad - 1)).astype(np.complex64))
lo_inc = jnp.uint32(123456789)
phase0 = jnp.uint32(987654321)

t0 = time.time()
ref = xlating_fir_decimate_frame(frame, jnp.asarray(h), decim, phase0, lo_inc)
ref.block_until_ready(); print("ref done", round(time.time() - t0, 1), flush=True)
t0 = time.time()
yf = xlating_fir_frame_pallas(frame, h, decim, lo_inc, interpret=True)
yf.block_until_ready(); print("pallas done", round(time.time() - t0, 1), flush=True)
got = rotate_output(yf, phase0, lo_inc, decim)
err = float(jnp.max(jnp.abs(got - ref)) / (jnp.mean(jnp.abs(ref)) + 1e-9))
print("max rel err vs xla:", err)

gain = jnp.float32(0.85)
prev_rot = jnp.complex64(0.3 + 0.1j)
d_ref, _ = quadrature_demod(ref, prev_rot, gain)
bm1 = exact.turns_u32_to_radians(phase0 - jnp.uint32(decim) * lo_inc)
prev_yf = (prev_rot * jnp.exp(-1j * bm1)).astype(jnp.complex64)
d_got, last = demod_unrotated(yf, prev_yf, gain, lo_inc, decim)
print("demod max abs err:", float(jnp.max(jnp.abs(d_got - d_ref))),
      "signal std:", float(jnp.std(d_ref)))
