#!/usr/bin/env python3
"""Generate checked-in golden vectors from the serial NumPy mirrors.

The mirrors replicate the reference's per-sample C++ work() loops
(fractional resampler lib/baz_fractional_resampler_cc.cc:154-196, FIR
+ rotate of the RTL-FM chain, gr agc/quad-demod/deemphasis) in float64
NumPy. Their outputs are frozen into tests/fixtures/golden.npz so the
block-vectorized JAX kernels are pinned against recorded vectors — a
drift guard that makes the parity claim auditable (SURVEY §4 strategy;
VERDICT r2 item 9). Regenerate ONLY deliberately:

    python tools/make_golden_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grbaz_tpu.ops.mmse import NSTEPS, NTAPS, TAPS_TABLE  # noqa: E402
from grbaz_tpu.ops.fir import low_pass_taps  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden.npz")


def serial_resample(x, ratio, mu0=0.0):
    out = []
    mu = float(mu0)
    ii = 0
    while ii + NTAPS <= len(x):
        imu = int(round(mu * NSTEPS))
        out.append(np.dot(x[ii:ii + NTAPS], TAPS_TABLE[imu]))
        s = mu + ratio
        f = np.floor(s)
        ii += int(f)
        mu = s - f
    return np.asarray(out)


def serial_fir_decimate(x, taps, decim):
    """y[k] = sum_j taps[j] * x[k*decim - j] (causal, zero history)."""
    n_out = len(x) // decim
    y = np.zeros(n_out, np.complex128 if np.iscomplexobj(x) else np.float64)
    t = np.asarray(taps, np.float64)
    for k in range(n_out):
        acc = 0.0
        for j in range(len(t)):
            i = k * decim - j
            if 0 <= i < len(x):
                acc += t[j] * x[i]
        y[k] = acc
    return y


def serial_wbfm(iq, fs, center, decim, audio_rate, max_dev, tau=75e-6):
    """Float64 serial mirror of the whole RTL-FM chain."""
    n = len(iq)
    taps = low_pass_taps(1.0, fs, 112.5e3, 75e3).astype(np.float64)
    lo = np.exp(-2j * np.pi * center / fs * np.arange(n))
    xr = iq.astype(np.complex128) * lo
    ch = serial_fir_decimate(xr, taps, decim)
    # quadrature demod, prev = 1+0j cold start
    quad_rate = fs / decim
    gain = quad_rate / (2 * np.pi * max_dev)
    prev = np.concatenate([[1.0 + 0j], ch[:-1]])
    d = np.angle(ch * np.conj(prev)) * gain
    # fractional resample to audio rate: the first output window starts
    # at the first demodulated sample, matching the block form's cold
    # start (mu_int = HIST into a frame of HIST zero-history samples)
    a = serial_resample(d, quad_rate / audio_rate)
    # deemphasis (bilinear RC)
    w_c = 1.0 / tau
    w_ca = 2.0 * audio_rate * np.tan(w_c / (2.0 * audio_rate))
    k = -w_ca / (2.0 * audio_rate)
    p1 = (1.0 + k) / (1.0 - k)
    b0 = -k / (1.0 - k)
    y = np.zeros(len(a))
    xp = 0.0
    yp = 0.0
    for i, xi in enumerate(a):
        y[i] = b0 * xi + b0 * xp + p1 * yp
        xp, yp = xi, y[i]
    return ch, d, a, y


def serial_agc(x, rate, reference):
    """Mirror of baz_agc_cc::work (/root/reference/lib/baz_agc_cc.cc:64-100):
    envelope EWMA, gain = reference / envelope."""
    env = 0.0
    out = np.empty_like(x)
    for i, v in enumerate(x):
        mag = abs(v)
        env = mag if i == 0 else env * (1.0 - rate) + mag * rate
        out[i] = v * (reference / env)
    return out


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rng = np.random.default_rng(0xC0FFEE)
    fix = {}

    # 1. fractional resampler on a noisy tone, decimating ratio 25/3
    n = 4096
    t = np.arange(n)
    x = (np.exp(2j * np.pi * 0.01 * t)
         + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)))
    fix["rs_in"] = x.astype(np.complex64)
    fix["rs_ratio"] = np.float64(400000.0 / 48000.0)
    fix["rs_out"] = serial_resample(x.astype(np.complex128),
                                    400000.0 / 48000.0)

    # 2. decimating FIR (WBFM channel taps, decim 8) on noise
    taps = low_pass_taps(1.0, 3.2e6, 112.5e3, 75e3)
    xn = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192))
    fix["fir_in"] = xn.astype(np.complex64)
    fix["fir_taps"] = taps
    fix["fir_decim"] = np.int64(8)
    fix["fir_out"] = serial_fir_decimate(xn, taps, 8)

    # 3. whole WBFM chain on a synthetic FM station at +250 kHz
    fs, decim, audio_rate, max_dev = 3.2e6, 8, 48e3, 75e3
    nw = 1 << 16
    tt = np.arange(nw) / fs
    msg = np.sin(2 * np.pi * 1e3 * tt)
    iq = np.exp(1j * (2 * np.pi * 250e3 * tt
                      + 2 * np.pi * max_dev * np.cumsum(msg) / fs))
    fix["wbfm_in"] = iq.astype(np.complex64)
    ch, d, a, y = serial_wbfm(iq, fs, 250e3, decim, audio_rate, max_dev)
    fix["wbfm_channel"] = ch.astype(np.complex128)
    fix["wbfm_quad"] = d
    fix["wbfm_audio"] = y

    # 4. AGC on a fading tone
    na = 4096
    env = 1.0 + 0.5 * np.sin(2 * np.pi * 3.0 * np.arange(na) / na)
    xa = (env * np.exp(2j * np.pi * 0.05 * np.arange(na))).astype(complex)
    fix["agc_in"] = xa.astype(np.complex64)
    fix["agc_rate"] = np.float64(1e-3)
    fix["agc_ref"] = np.float64(1.0)
    fix["agc_out"] = serial_agc(xa, 1e-3, 1.0)

    np.savez_compressed(OUT, **fix)
    size = os.path.getsize(OUT)
    print(f"wrote {OUT} ({size/1024:.0f} KiB, {len(fix)} arrays)")


if __name__ == "__main__":
    main()
