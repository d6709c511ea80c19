"""Spectral-analysis kernels: framing, windowed FFT power spectra, FAC.

TPU-native equivalents of the reference's spectral plumbing:

* ``Vectorize``/``Overlap`` — stream->frame restructuring; Overlap
  mirrors ``baz_overlap`` (/root/reference/lib/baz_overlap.cc:71-79 via
  swig/baz_swig.i:777-786): each frame repeats the last ``overlap``
  items of the previous frame (the overlap-save framing used for
  spectral processing).
* ``PowerSpectrum`` — the realtime_fft / wxgui-fft analog: windowed FFT,
  |.|^2, single-pole averaging, dB scaling.
* ``FACSpectrum`` — Fast Auto-Correlation display chain, the exact
  pipeline of python/facsink.py:124-143: frame -> keep-one-in-n ->
  FFT -> |.| -> FFT -> |.| -> single-pole IIR -> 20*log10 - 20*log10(N).

Frames batch naturally ([n_frames, fft_size]), so FFTs run batched — the
TPU-friendly shape (the reference processes one vector per work() call).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.fir import _window


class Vectorize(Block):
    """Stream -> frames of ``size`` (gr stream_to_vector). Requires
    size | block_size; carries no remainder (use Overlap for history)."""

    def __init__(self, size: int, name=None):
        super().__init__(name)
        self.size = int(size)

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        assert n % self.size == 0, "block size must be a multiple of frame size"
        frames = x.data.reshape(-1, self.size)
        out = x.like(frames, count=x.count // self.size,
                     rate_scale=1.0 / self.size)
        return state, (out,)


class Overlap(Block):
    """Overlapping frames: frame k spans ``size`` samples advancing by
    ``size - overlap`` (baz_overlap semantics). Carries the tail."""

    def __init__(self, size: int, overlap: int, dtype=jnp.complex64, name=None):
        super().__init__(name)
        if not 0 <= overlap < size:
            raise ValueError("need 0 <= overlap < size")
        self.size = int(size)
        self.overlap = int(overlap)
        self.advance = self.size - self.overlap
        self.dtype = dtype

    def init_state(self):
        return dict(tail=np.zeros((self.overlap,), self.dtype))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        assert n % self.advance == 0, \
            "block size must be a multiple of (size - overlap)"
        frame_src = jnp.concatenate([state["tail"], x.data])
        n_frames = n // self.advance
        starts = jnp.arange(n_frames, dtype=jnp.int32) * self.advance
        idx = starts[:, None] + jnp.arange(self.size, dtype=jnp.int32)[None, :]
        frames = frame_src[idx]
        new_state = dict(tail=frame_src[-self.overlap:]) if self.overlap \
            else state
        out = x.like(frames, count=x.count // self.advance,
                     rate_scale=1.0 / self.advance)
        return new_state, (out,)


class SinglePoleIIRVector(Block):
    """Per-bin single-pole IIR over frames (gr single_pole_iir_filter_ff):
    y = alpha*x + (1-alpha)*y_prev, applied frame-to-frame."""

    def __init__(self, alpha: float, size: int, name=None):
        super().__init__(name)
        self.alpha0 = float(alpha)
        self.size = int(size)

    def init_state(self):
        return dict(prev=np.zeros((self.size,), np.float32))

    def init_params(self):
        return dict(alpha=np.float32(self.alpha0))

    def apply(self, state, params, x: Stream):
        a = params["alpha"]

        def body(prev, frame):
            y = a * frame + (1.0 - a) * prev
            return y, y

        last, ys = jax.lax.scan(body, state["prev"], x.data)
        return dict(prev=last), (x.like(ys, count=x.count),)


class PowerSpectrum(Block):
    """Frames [n, N] -> averaged dB power spectra [n, N].

    Windowed FFT + |.|^2 + optional single-pole average + 10*log10,
    fftshifted so bin 0 is the most negative frequency (display order).
    """

    def __init__(self, fft_size: int, window: str = "blackmanharris",
                 avg_alpha: float = 1.0, ref_scale: float = 1.0,
                 shift: bool = True, name=None):
        super().__init__(name)
        self.size = int(fft_size)
        self.win = _window(fft_size, window).astype(np.float32)
        # normalize: unit-amplitude complex tone -> 0 dBFS (all the
        # energy of exp(jwt) lands in one bin: peak = sum(win))
        self.norm = np.float32(np.sum(self.win) * ref_scale)
        self.avg_alpha0 = float(avg_alpha)
        self.shift = shift

    def init_state(self):
        return dict(avg=np.zeros((self.size,), np.float32))

    def init_params(self):
        return dict(alpha=np.float32(self.avg_alpha0))

    def apply(self, state, params, x: Stream):
        frames = x.data * self.win
        spec = jnp.fft.fft(frames, axis=-1)
        p = (spec.real ** 2 + spec.imag ** 2) / (self.norm ** 2)
        a = params["alpha"]

        def body(prev, fr):
            y = a * fr + (1.0 - a) * prev
            return y, y

        last, ps = jax.lax.scan(body, state["avg"], p)
        db = 10.0 * jnp.log10(jnp.maximum(ps, 1e-30))
        if self.shift:
            db = jnp.fft.fftshift(db, axes=-1)
        return dict(avg=last), (x.like(db.astype(jnp.float32), count=x.count),)


class FACSpectrum(Block):
    """Fast Auto-Correlation spectrum — python/facsink.py:124-143 pipeline.

    Input: frames [n, N] (complex or float). Per kept frame:
    ``20*log10(|FFT(|FFT(frame)|)|) - 20*log10(N)`` with single-pole
    averaging between the second magnitude and the log.
    """

    def __init__(self, fac_size: int, keep_one_in_n: int = 1,
                 avg_alpha: float = 1.0, name=None):
        super().__init__(name)
        self.size = int(fac_size)
        self.keep = max(1, int(keep_one_in_n))
        self.avg_alpha0 = float(avg_alpha)

    def init_state(self):
        return dict(avg=np.zeros((self.size,), np.float32),
                    phase=np.int32(self.keep - 1))

    def init_params(self):
        return dict(alpha=np.float32(self.avg_alpha0))

    def apply(self, state, params, x: Stream):
        n_frames = x.data.shape[0]
        cap = n_frames // self.keep + 1
        k = jnp.arange(cap + 1, dtype=jnp.int32)
        idx = state["phase"] + k * self.keep
        valid = idx[:cap] < jnp.minimum(x.count, n_frames)
        frames = x.data[jnp.clip(idx[:cap], 0, n_frames - 1)]
        n_out = jnp.sum(valid.astype(jnp.int32))
        new_phase = idx[n_out] - n_frames

        m1 = jnp.abs(jnp.fft.fft(frames.astype(jnp.complex64), axis=-1))
        m2 = jnp.abs(jnp.fft.fft(m1.astype(jnp.complex64), axis=-1))
        a = params["alpha"]

        def body(prev, args):
            fr, v = args
            # masked frames must not pollute the average
            y = jnp.where(v, a * fr + (1.0 - a) * prev, prev)
            return y, y

        last, avg = jax.lax.scan(body, state["avg"], (m2, valid))
        db = 20.0 * jnp.log10(jnp.maximum(avg, 1e-30)) \
            - np.float32(20.0 * np.log10(self.size))
        out = x.like(db.astype(jnp.float32), count=n_out,
                     rate_scale=1.0 / self.keep)
        return dict(avg=last, phase=new_phase), (out,)
