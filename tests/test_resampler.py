"""Fractional resampler: golden tests vs a NumPy serial reference model.

The serial model mirrors the reference's general_work loop
(/root/reference/lib/baz_fractional_resampler_cc.cc:154-196): per output
interpolate at (ii, mu) with the same tap table, then mu += ratio.
"""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.mmse import CENTER, NSTEPS, NTAPS, TAPS_TABLE, design_taps
from grbaz_tpu.ops.resampler import FractionalResampler, HIST
from tests.conftest import snr_db


def serial_resample(x, ratio, n_out, mu0=0.0):
    """Serial long-double-style model using the same (derived) tap table."""
    taps = TAPS_TABLE  # (129, 8)
    out = []
    mu = float(mu0)
    ii = 0
    for _ in range(n_out):
        if ii + NTAPS > len(x):
            break
        imu = int(round(mu * NSTEPS))
        out.append(np.dot(x[ii:ii + NTAPS], taps[imu]))
        s = mu + ratio
        f = np.floor(s)
        ii += int(f)
        mu = s - f
    return np.array(out)


def run_block_resampler(x, ratio, block_size, dtype=np.complex64, min_ratio=None):
    rs = FractionalResampler(block_size, ratio, dtype=jnp.complex64
                             if dtype == np.complex64 else jnp.float32,
                             min_ratio=min_ratio)
    state, params = rs.init_state(), rs.init_params()
    outs = []
    for i in range(0, len(x) - block_size + 1, block_size):
        blk = Stream.full(jnp.asarray(x[i:i + block_size]))
        state, (y,) = rs.apply(state, params, blk)
        n = int(y.count)
        outs.append(np.asarray(y.data[:n]))
    return np.concatenate(outs)


def make_tone(n, f_rel, dtype=np.complex64, rng=None):
    t = np.arange(n)
    sig = np.exp(2j * np.pi * f_rel * t)
    if rng is not None:
        sig = sig + 0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return sig.astype(dtype)


def test_interpolator_quality_on_tone():
    """Interpolated output must match the ideal delayed tone to >55 dB."""
    f = 0.11
    x = make_tone(20000, f)
    ratio = 1.0  # pure fractional delay path, mu sweeps with phase_shift
    # on-grid phases: off-grid mu adds ~1/256-sample quantization noise,
    # identical to the reference's 128-step interpolator
    for mu in [0.25, 0.5, 0.8125]:
        n_out = 1000
        taps = TAPS_TABLE[int(round(mu * NSTEPS))]
        y = np.array([np.dot(x[k:k + NTAPS], taps) for k in range(n_out)])
        ideal = np.exp(2j * np.pi * f * (np.arange(n_out) + CENTER + mu))
        assert snr_db(ideal, y) > 55, f"mu={mu}: {snr_db(ideal, y):.1f} dB"


def test_blockwise_matches_serial_downsample():
    rng = np.random.default_rng(1)
    x = make_tone(40000, 0.05, rng=rng)
    ratio = 2.5
    y_blk = run_block_resampler(x, ratio, 4096)
    y_ser = serial_resample(x, ratio, len(y_blk) + 10)
    n = min(len(y_blk), len(y_ser))
    assert n > 14000
    assert snr_db(y_ser[:n], y_blk[:n]) > 100  # same taps, same positions


def test_blockwise_matches_serial_upsample():
    rng = np.random.default_rng(2)
    x = make_tone(8192 * 3, 0.02, rng=rng)
    ratio = 0.7
    y_blk = run_block_resampler(x, ratio, 8192, min_ratio=0.6)
    y_ser = serial_resample(x, ratio, len(y_blk) + 10)
    n = min(len(y_blk), len(y_ser))
    assert snr_db(y_ser[:n], y_blk[:n]) > 100


def test_blockwise_matches_serial_irrational_ratio():
    rng = np.random.default_rng(3)
    x = make_tone(40000, 0.01, rng=rng)
    ratio = np.pi  # irrational: exercises the fixed-point carry path
    y_blk = run_block_resampler(x, ratio, 4096)
    # serial model with the fixed-point-quantized ratio (what the device ran)
    from grbaz_tpu.ops import exact
    ip, fr = exact.ratio_to_fixed(ratio)
    y_ser = serial_resample(x, exact.fixed_to_ratio(ip, fr), len(y_blk) + 10)
    n = min(len(y_blk), len(y_ser))
    assert snr_db(y_ser[:n], y_blk[:n]) > 90


def test_block_boundary_bit_consistency():
    """Different block sizes must give identical outputs (the north-star
    boundary-consistency requirement, BASELINE.md)."""
    x = make_tone(16384 * 2, 0.07)
    y_a = run_block_resampler(x, 1.875, 2048)
    y_b = run_block_resampler(x, 1.875, 8192)
    n = min(len(y_a), len(y_b))
    np.testing.assert_array_equal(y_a[:n], y_b[:n])


def test_rate_48k_from_250k():
    """The RTL-FM audio resample (quad rate 250k -> 48k audio)."""
    ratio = 250000.0 / 48000.0
    x = make_tone(50000, 0.003)
    y = run_block_resampler(x, ratio, 5000)
    f_out = 0.003 * ratio
    ideal = np.exp(2j * np.pi * f_out * (np.arange(len(y)) + (CENTER) / ratio))
    # frequency preserved: check via FFT peak
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    peak = np.argmax(spec) / len(y)
    assert abs(peak - f_out) < 1e-3


def test_variable_ratio_stream_mode():
    """Ratio-stream mode vs a serial model of the reference loop
    (lib/baz_fractional_resampler_cc.cc:200-217: emit at (ii, mu), read
    inc = rr[ii], mu += inc, ii += floor)."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS, TAPS_TABLE
    from grbaz_tpu.ops.resampler import HIST, VariableRatioResampler

    rng = np.random.default_rng(31)
    n, blocks = 512, 3
    x = rng.standard_normal(n * blocks).astype(np.float32)
    # slowly-varying ratio around 1.3 (the rate-discipline use case)
    rr = (1.3 + 0.05 * np.sin(np.arange(n * blocks) * 0.01)) \
        .astype(np.float32)

    # serial model with the same exact 32.32 phase + taps table
    def serial():
        frame = np.concatenate([np.zeros(HIST, np.float32), x])
        rrf = np.concatenate([np.zeros(HIST, np.float32), rr])
        q, mu_frac = HIST, 0
        out = []
        shift = 32 - NSTEPS_LOG2 - 1
        while q + NTAPS <= len(frame):
            # same rounding as exact.frac_to_phase_bin (bins 0..NSTEPS
            # inclusive; the top bin is the next-sample filter)
            bin_ = ((mu_frac >> 1) + (1 << (shift - 1))) >> shift
            out.append(float(frame[q:q + NTAPS] @ TAPS_TABLE[bin_]))
            inc = float(rrf[q])
            ip = int(np.floor(inc))
            fr = int(np.float32(inc - ip) * (2.0 ** 32)) & 0xFFFFFFFF
            s = mu_frac + fr
            q += ip + (s >> 32)
            mu_frac = s & 0xFFFFFFFF
        return np.asarray(out, np.float32)

    ref = serial()

    blk = VariableRatioResampler(n, dtype=jnp.float32)
    state, params = blk.init_state(), blk.init_params()
    outs = []
    for b in range(blocks):
        sx = Stream.full(jnp.asarray(x[b * n:(b + 1) * n]))
        sr = Stream.full(jnp.asarray(rr[b * n:(b + 1) * n]))
        state, (y,) = blk.apply(state, params, sx, sr)
        outs.append(np.asarray(y.data)[:int(y.count)])
    got = np.concatenate(outs)

    m = min(len(got), len(ref))
    assert m > 0.9 * len(ref)
    assert snr_db(ref[:m], got[:m]) > 80
