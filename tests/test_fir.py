"""FIR kernels vs np.convolve golden models."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.fir import (FIRDecimator, FreqXlatingFIRDecimator,
                               low_pass_taps)
from tests.conftest import snr_db


def run_streaming(block, x, block_size):
    state, params = block.init_state(), block.init_params()
    outs = []
    for i in range(0, len(x), block_size):
        s = Stream.full(jnp.asarray(x[i:i + block_size]))
        state, (y,) = block.apply(state, params, s)
        outs.append(np.asarray(y.data[:int(y.count)]))
    return np.concatenate(outs)


def test_fir_matches_convolve(rng):
    taps = low_pass_taps(1.0, 1.0, 0.1, 0.05)
    x = (rng.standard_normal(16384) + 1j * rng.standard_normal(16384)).astype(np.complex64)
    y = run_streaming(FIRDecimator(taps, 1), x, 4096)
    ref = np.convolve(x.astype(np.complex128), taps.astype(np.float64))[:len(x)]
    assert snr_db(ref, y) > 100


def test_fir_decimation_matches_convolve(rng):
    taps = low_pass_taps(1.0, 8.0, 0.4, 0.2)
    assert len(taps) > 8
    x = (rng.standard_normal(32768) + 1j * rng.standard_normal(32768)).astype(np.complex64)
    for d in (2, 4, 8):
        y = run_streaming(FIRDecimator(taps, d), x, 4096)
        ref = np.convolve(x.astype(np.complex128), taps.astype(np.float64))[:len(x):d]
        n = min(len(y), len(ref))
        assert snr_db(ref[:n], y[:n]) > 100, f"decim {d}"


def test_fir_block_size_invariance(rng):
    taps = low_pass_taps(1.0, 1.0, 0.2, 0.1)
    x = rng.standard_normal(16384).astype(np.float32)
    ya = run_streaming(FIRDecimator(taps, 2, dtype=jnp.float32), x, 2048)
    yb = run_streaming(FIRDecimator(taps, 2, dtype=jnp.float32), x, 8192)
    np.testing.assert_array_equal(ya, yb)


def test_freq_xlating_extracts_channel(rng):
    """A tone at +400 kHz in a 3.2 MHz stream must land at DC after
    translation, while a tone at -800 kHz is rejected by the lowpass."""
    fs = 3.2e6
    n = 1 << 17
    t = np.arange(n)
    want = np.exp(2j * np.pi * (400e3 / fs) * t)
    spur = np.exp(2j * np.pi * (-800e3 / fs) * t)
    x = (want + spur).astype(np.complex64)
    taps = low_pass_taps(1.0, fs, 100e3, 50e3)
    blk = FreqXlatingFIRDecimator(taps, decim=8, center_freq=400e3, sample_rate=fs)
    y = run_streaming(blk, x, 1 << 15)
    y = y[len(taps) // 8:]  # drop transient
    # result should be ~DC (the translated tone), spur attenuated >50 dB
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    dc_power = spec[0] + spec[1] + spec[-1]
    rest = np.sort(spec)[:-8]
    assert dc_power > 100 * np.max(rest)


def test_freq_xlating_retune(rng):
    fs = 1.0e6
    n = 1 << 16
    t = np.arange(n)
    x = (np.exp(2j * np.pi * 0.1 * t) + np.exp(2j * np.pi * 0.3 * t)).astype(np.complex64)
    taps = low_pass_taps(1.0, fs, 50e3, 25e3)
    blk = FreqXlatingFIRDecimator(taps, decim=4, center_freq=0.1 * fs, sample_rate=fs)
    state, params = blk.init_state(), blk.init_params()
    s = Stream.full(jnp.asarray(x))
    state, (y1,) = blk.apply(state, params, s)
    # retune to the other tone without recompiling
    params2 = blk.freq_params(0.3 * fs, fs)
    state, (y2,) = blk.apply(state, params2, s)
    m1 = np.abs(np.asarray(y1.data[2048:]))
    m2 = np.abs(np.asarray(y2.data[2048:]))
    assert np.mean(m1) > 0.5 and np.mean(m2) > 0.5


def test_poly_vs_windows_formulations():
    """The polyphase-matmul fast path must match the strided-window
    reference formulation for real and complex frames."""
    import jax.numpy as jnp
    from grbaz_tpu.ops.fir import (fir_decimate_frame_windows,
                                   _fir_decimate_poly, low_pass_taps,
                                   prepare_taps)
    rng = np.random.default_rng(7)
    for decim in (4, 8, 25):
        taps = low_pass_taps(1.0, 1e6, 1e5, 5e4)
        h = jnp.asarray(prepare_taps(taps, decim))
        n = decim * 1024
        fr = (rng.standard_normal(n + len(h) - 1)
              + 1j * rng.standard_normal(n + len(h) - 1)).astype(np.complex64)
        a = np.asarray(fir_decimate_frame_windows(jnp.asarray(fr), h, decim))
        b = np.asarray(_fir_decimate_poly(jnp.asarray(fr), h, decim))
        assert np.max(np.abs(a - b)) < 1e-4


def test_pallas_fir_parity_interpret():
    """Pallas kernel parity vs the XLA formulation (interpreter mode)."""
    import jax.numpy as jnp
    from grbaz_tpu.ops.fir import (fir_decimate_frame, low_pass_taps,
                                   prepare_taps)
    from grbaz_tpu.ops.pallas import fir_decimate_frame_pallas
    rng = np.random.default_rng(11)
    decim = 8
    taps = low_pass_taps(1.0, 3.2e6, 125e3, 50e3)
    h = jnp.asarray(prepare_taps(taps, decim))
    n = decim * 2048
    fr = (rng.standard_normal(n + len(h) - 1)
          + 1j * rng.standard_normal(n + len(h) - 1)).astype(np.complex64)
    a = np.asarray(fir_decimate_frame(jnp.asarray(fr), h, decim))
    b = np.asarray(fir_decimate_frame_pallas(jnp.asarray(fr), h, decim,
                                             interpret=True))
    assert np.max(np.abs(a - b)) < 1e-4


def test_rotated_taps_xlating_fir_matches_rotate_then_filter():
    """The rotated-taps identity must match rotate-then-filter across
    block boundaries (same exact u32 phase lineage)."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator, low_pass_taps

    fs, decim, fc = 1.024e6, 8, 173e3
    taps = low_pass_taps(1.0, fs, 60e3, 50e3)
    rng = np.random.default_rng(12)
    n, block = 16384, 4096
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)

    def run(rotate):
        blk = FreqXlatingFIRDecimator(taps, decim, fc, fs,
                                      rotate_taps=rotate)
        state, params = blk.init_state(), blk.init_params()
        outs = []
        for i in range(0, n, block):
            s = Stream.full(jnp.asarray(x[i:i + block]), sample_rate=fs)
            state, (y,) = blk.apply(state, params, s)
            outs.append(np.asarray(y.data)[:int(y.count)])
        return np.concatenate(outs)

    ref = run(False)
    got = run(True)
    assert got.shape == ref.shape
    assert snr_db(ref, got) > 110  # f32 rounding path differences only


def test_fft_fir_matches_direct():
    """Overlap-save FFT convolution vs the time-domain kernel."""
    from grbaz_tpu.ops.fir import (fft_fir_frame, fir_decimate_frame,
                                   prepare_taps)
    import jax
    rng = np.random.default_rng(17)
    taps = (rng.standard_normal(1201) * np.hanning(1201)).astype(np.float32)
    for decim in (1, 4):
        h = prepare_taps(taps, decim)
        hist = len(h) - 1
        for dtype in (np.complex64, np.float32):
            frame = rng.standard_normal(hist + 8192).astype(np.float32)
            if dtype == np.complex64:
                frame = (frame + 1j * rng.standard_normal(len(frame))) \
                    .astype(np.complex64)
            ref = np.asarray(jax.jit(
                lambda f: fir_decimate_frame(f, jnp.asarray(h), decim))(frame))
            got = np.asarray(jax.jit(
                lambda f: fft_fir_frame(f, jnp.asarray(h), decim))(frame))
            assert got.shape == ref.shape
            assert snr_db(ref, got) > 100, (decim, dtype)
