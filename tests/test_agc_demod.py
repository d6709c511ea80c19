"""AGC / demod kernels vs serial NumPy models of the reference loops."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.agc import AGC
from grbaz_tpu.ops.demod import FMDeemphasis, PowerSquelch, QuadratureDemod
from tests.conftest import snr_db


def serial_agc(x, rate, reference):
    """Mirror of baz_agc_cc::work (/root/reference/lib/baz_agc_cc.cc:64-100)."""
    env = 0.0
    out = np.empty_like(x)
    envs = np.empty(len(x), np.float64)
    gains = np.empty(len(x), np.float64)
    for i, v in enumerate(x):
        mag = abs(v)
        env = mag if i == 0 else env * (1.0 - rate) + mag * rate
        gain = reference / env
        out[i] = v * gain
        envs[i] = env
        gains[i] = gain
    return out, envs, gains


def run_streaming(block, x, block_size, n_outs=1):
    state, params = block.init_state(), block.init_params()
    outs = [[] for _ in range(block.n_out)]
    for i in range(0, len(x), block_size):
        s = Stream.full(jnp.asarray(x[i:i + block_size]))
        state, ys = block.apply(state, params, s)
        for j, y in enumerate(ys):
            outs[j].append(np.asarray(y.data[:int(y.count)]))
    return [np.concatenate(o) for o in outs]


def test_agc_matches_serial(rng):
    n = 8192
    x = ((1.0 + 0.5 * np.sin(2 * np.pi * 0.001 * np.arange(n)))
         * np.exp(2j * np.pi * 0.1 * np.arange(n))).astype(np.complex64)
    rate, ref = 1e-2, 0.7
    y, env, gain = run_streaming(AGC(rate, ref), x, 1024)
    y_s, env_s, gain_s = serial_agc(x.astype(np.complex128), rate, ref)
    assert snr_db(y_s, y) > 60
    assert snr_db(env_s, env) > 60
    assert snr_db(gain_s, gain) > 60


def test_agc_block_size_invariance():
    n = 4096
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    y_a, _, _ = run_streaming(AGC(1e-3, 1.0), x, 512)
    y_b, _, _ = run_streaming(AGC(1e-3, 1.0), x, 4096)
    assert snr_db(y_b, y_a) > 90  # f32 associative reorder only


def test_quadrature_demod_recovers_fm():
    fs = 250e3
    fm_dev = 75e3
    n = 50000
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 1000.0 * t)
    phase = 2 * np.pi * fm_dev * np.cumsum(msg) / fs
    x = np.exp(1j * phase).astype(np.complex64)
    gain = fs / (2 * np.pi * fm_dev)
    demod = QuadratureDemod(gain)
    (y,) = run_streaming(demod, x, 5000)
    # ignore the first transient sample
    assert snr_db(msg[1:], y[1:]) > 50


def test_quadrature_demod_block_invariance():
    rng = np.random.default_rng(9)
    x = np.exp(1j * np.cumsum(rng.standard_normal(8192) * 0.3)).astype(np.complex64)
    (ya,) = run_streaming(QuadratureDemod(1.0), x, 1024)
    (yb,) = run_streaming(QuadratureDemod(1.0), x, 8192)
    np.testing.assert_array_equal(ya, yb)


def test_power_squelch_gates_noise():
    n = 8192
    rng = np.random.default_rng(11)
    quiet = 1e-4 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    loud = np.exp(2j * np.pi * 0.01 * np.arange(n))
    x = np.concatenate([quiet, loud]).astype(np.complex64)
    sq = PowerSquelch(threshold_db=-20, alpha=1e-2)
    (y,) = run_streaming(sq, x, 2048)
    assert np.all(y[:n] == 0)          # noise fully muted
    assert np.mean(np.abs(y[n + 1000:]) > 0.5) > 0.99  # signal passes


def test_deemphasis_rolls_off_highs():
    fs = 48000.0
    n = 1 << 15
    t = np.arange(n) / fs
    lo_tone = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
    hi_tone = np.sin(2 * np.pi * 10000.0 * t).astype(np.float32)
    de = FMDeemphasis(fs, tau=75e-6)
    (y_lo,) = run_streaming(de, lo_tone, 4096)
    de2 = FMDeemphasis(fs, tau=75e-6)
    (y_hi,) = run_streaming(de2, hi_tone, 4096)
    g_lo = np.std(y_lo[4096:]) / np.std(lo_tone[4096:])
    g_hi = np.std(y_hi[4096:]) / np.std(hi_tone[4096:])
    # 75us -> corner ~2.1 kHz; 10 kHz should be ~12+ dB below 100 Hz
    assert g_lo > 0.9
    assert 20 * np.log10(g_hi / g_lo) < -10


def run_partial(block, x, block_size, capacity):
    """Stream x through in partial blocks: each device block has
    `capacity` slots but only `block_size` valid samples (zero tail) —
    the shape every rate-changing upstream (fractional resampler, gate)
    produces."""
    import jax.numpy as jnp
    state, params = block.init_state(), block.init_params()
    outs = []
    for i in range(0, len(x), block_size):
        chunk = x[i:i + block_size]
        padded = np.zeros(capacity, chunk.dtype)
        padded[:len(chunk)] = chunk
        s = Stream(data=jnp.asarray(padded), count=jnp.int32(len(chunk)),
                   meta=Stream.full(jnp.asarray(padded)).meta)
        state, ys = block.apply(state, params, s)
        outs.append(np.asarray(ys[0].data[:int(ys[0].count)]))
    return np.concatenate(outs)


def test_iir_blocks_partial_block_state_invariance():
    """IIR state must chain across partial blocks exactly as if the
    stream were contiguous (invalid tail samples are identity ops)."""
    from grbaz_tpu.ops.demod import AMDemod
    rng = np.random.default_rng(21)
    n = 8192
    xf = rng.standard_normal(n).astype(np.float32)
    xc = (xf + 1j * rng.standard_normal(n)).astype(np.complex64)

    for mk, x in [(lambda: FMDeemphasis(48e3, 75e-6), xf),
                  (lambda: PowerSquelch(-30, 1e-3), xc),
                  (lambda: AMDemod(1e-3), xc)]:
        (y_full,) = run_streaming(mk(), x, 1024)
        y_part = run_partial(mk(), x, 1024, capacity=2048)
        np.testing.assert_array_equal(
            y_full, y_part, err_msg=f"{mk().__class__.__name__} state "
            "poisoned by invalid tail samples")
