"""FIR filtering: decimating FIR and frequency-translating FIR.

Replaces the host-GR blocks the reference's flagship chain is built on
(``freq_xlating_fir_filter`` in samples/RTL-FM.grc; SURVEY.md §3.1), and
the filtering halves of gr-baz's own DSP blocks.

TPU-first formulation: a decimating FIR over a sample block is expressed
as a *strided window matrix product* — the frame (history + block) is
restructured into ``[N/D, T]`` windows with D|T static slices (no
gather), then contracted against the tap vector. XLA fuses the
restructuring; the contraction vectorizes on the VPU/MXU. The carry
state is the last ``T-1`` samples (the filter tail) — exactly what a
time-sharded multi-chip version exchanges as halo.

Frequency translation is rotate-then-filter with the exact uint32 turn
phase from ``ops.exact`` — phase-coherent forever, no f64.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops import exact


# ---------------------------------------------------------------------------
# tap design (firdes equivalents, derived from first principles)
# ---------------------------------------------------------------------------

def _window(n: int, kind: str = "hamming") -> np.ndarray:
    t = np.arange(n)
    if kind == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * t / (n - 1))
    if kind == "hann":
        return 0.5 - 0.5 * np.cos(2 * np.pi * t / (n - 1))
    if kind == "blackman":
        return (0.42 - 0.5 * np.cos(2 * np.pi * t / (n - 1))
                + 0.08 * np.cos(4 * np.pi * t / (n - 1)))
    if kind == "blackmanharris":
        return (0.35875 - 0.48829 * np.cos(2 * np.pi * t / (n - 1))
                + 0.14128 * np.cos(4 * np.pi * t / (n - 1))
                - 0.01168 * np.cos(6 * np.pi * t / (n - 1)))
    if kind == "rect":
        return np.ones(n)
    raise ValueError(f"unknown window {kind}")


def low_pass_taps(gain: float, sample_rate: float, cutoff: float,
                  transition: float, window: str = "hamming") -> np.ndarray:
    """Windowed-sinc lowpass (firdes.low_pass equivalent), unity DC gain."""
    # Harris rule-of-thumb tap estimate for ~53 dB attenuation (hamming).
    atten = {"hamming": 53.0, "hann": 44.0, "blackman": 74.0,
             "blackmanharris": 92.0, "rect": 21.0}[window]
    ntaps = int(atten * sample_rate / (22.0 * transition))
    ntaps |= 1  # odd for symmetric linear phase
    m = (ntaps - 1) // 2
    t = np.arange(ntaps) - m
    fc = cutoff / sample_rate
    h = 2.0 * fc * np.sinc(2.0 * fc * t) * _window(ntaps, window)
    h *= gain / np.sum(h)
    return h.astype(np.float32)


def band_pass_taps(gain: float, sample_rate: float, low: float, high: float,
                   transition: float, window: str = "hamming") -> np.ndarray:
    """Real band-pass via modulated lowpass."""
    bw = (high - low) / 2.0
    lp = low_pass_taps(1.0, sample_rate, bw, transition, window)
    m = (len(lp) - 1) // 2
    t = np.arange(len(lp)) - m
    center = (low + high) / 2.0
    h = lp * 2.0 * np.cos(2 * np.pi * center / sample_rate * t)
    # normalize peak response at center frequency
    w = 2 * np.pi * center / sample_rate
    resp = np.abs(np.sum(h * np.exp(-1j * w * np.arange(len(h)))))
    h *= gain / resp
    return h.astype(np.float32)


# ---------------------------------------------------------------------------
# core kernels
# ---------------------------------------------------------------------------

def _strided_windows(frame: jax.Array, tpad: int, decim: int,
                     n_out: int) -> jax.Array:
    """windows[k, t] = frame[k*decim + t]; built from tpad/decim slices.

    frame must have length >= (n_out-1)*decim + tpad.
    """
    parts = []
    for m in range(tpad // decim):
        seg = jax.lax.dynamic_slice_in_dim(frame, m * decim, n_out * decim)
        parts.append(seg.reshape(n_out, decim))
    return jnp.concatenate(parts, axis=1)


def fir_decimate_frame_windows(frame: jax.Array, h_rev_pad: jax.Array,
                               decim: int) -> jax.Array:
    """Strided-window formulation (materializes [n_out, tpad] windows).

    Kept as the reference implementation and the fallback for small
    decimation factors where the polyphase matmul degenerates.
    """
    tpad = h_rev_pad.shape[0]
    n_new = frame.shape[0] - (tpad - 1)
    assert n_new % decim == 0, "block size must be a multiple of decim"
    n_out = n_new // decim
    if jnp.iscomplexobj(frame):
        wr = _strided_windows(frame.real, tpad, decim, n_out)
        wi = _strided_windows(frame.imag, tpad, decim, n_out)
        h = h_rev_pad.astype(jnp.float32)
        yr = wr @ h
        yi = wi @ h
        return jax.lax.complex(yr, yi)
    w = _strided_windows(frame, tpad, decim, n_out)
    return w @ h_rev_pad.astype(frame.dtype)


def _fir_decimate_poly(frame: jax.Array, h_rev_pad: jax.Array,
                       decim: int) -> jax.Array:
    """Polyphase-matmul formulation (the TPU fast path).

    View the frame as its polyphase matrix ``Z[j, p] = frame[j*decim+p]``
    and the padded reversed taps as ``H[m, p] = h[m*decim+p]``; then

        Q = Z @ H^T                       (one MXU matmul)
        y[k] = sum_m Q[k+m, m]            (M shifted adds, fused by XLA)

    equals ``y[k] = sum_t h[t] frame[k*decim+t]``. This never
    materializes the ``[n_out, tpad]`` window matrix the strided
    formulation needs — measured ~11x faster on TPU v5e for the WBFM
    channelizer shape (155 taps, decim 8, 1M block). HIGHEST matmul
    precision keeps the result f32-exact (default TPU precision costs
    ~1e-3 relative error on this contraction).
    """
    tpad = h_rev_pad.shape[0]
    n_phases = tpad // decim
    n_out = (frame.shape[0] - (tpad - 1)) // decim
    n_rows = n_out + n_phases
    pad = n_rows * decim - frame.shape[0]
    if pad > 0:
        frame = jnp.concatenate([frame, jnp.zeros(pad, frame.dtype)])
    z = frame[: n_rows * decim].reshape(n_rows, decim)
    h2 = h_rev_pad.reshape(n_phases, decim).astype(jnp.float32)

    def mm(a):
        return jnp.dot(a, h2.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    def band_sum(q):
        return sum(jax.lax.dynamic_slice_in_dim(q[:, m], m, n_out)
                   for m in range(n_phases))

    if jnp.iscomplexobj(frame):
        return jax.lax.complex(band_sum(mm(z.real)), band_sum(mm(z.imag)))
    return band_sum(mm(z))


def fir_decimate_frame(frame: jax.Array, h_rev_pad: jax.Array,
                       decim: int) -> jax.Array:
    """Causal decimating FIR over a frame with Tpad-1 leading history.

    y[k] = sum_j h[j] * x[k*decim - j], where x[0] is frame[Tpad-1] (the
    first post-history sample). ``h_rev_pad`` is the reversed tap vector
    left-padded with zeros to a multiple of ``decim``.

    Dispatches to the polyphase-matmul fast path when the shape suits it
    (decim >= 4 and a bounded number of phases), else the strided-window
    formulation.
    """
    tpad = h_rev_pad.shape[0]
    n_phases = tpad // decim
    if decim >= 4 and n_phases <= 128:
        return _fir_decimate_poly(frame, h_rev_pad, decim)
    return fir_decimate_frame_windows(frame, h_rev_pad, decim)


def _fir_body_matrices(h_rev_pad: np.ndarray, decim: int):
    """Tap matrices for the zero-copy body formulation (numpy, static).

    With H = tpad-1 history samples, body output k = q + M satisfies

        y[k] = sum_{m,p} h2[m,p] * x[(q+m)D + p + 1]

    (the +1 comes from H = MD - 1). Column p+1 of the polyphase view
    ``Zx[j, c] = x[jD + c]`` for p <= D-2, and column 0 of row q+m+1
    for p = D-1. Both land in ONE matmul against ``[D, 2M]`` taps
    (A: shifted columns, B: the wrap column) followed by 2M banded adds.
    """
    h2 = jnp.asarray(h_rev_pad, jnp.float32).reshape(-1, decim)  # [M, D]
    M = h2.shape[0]
    zrow = jnp.zeros((1, M), jnp.float32)
    a = jnp.concatenate([zrow, h2[:, :decim - 1].T])   # A[c, m] = h2[m, c-1]
    b = jnp.concatenate([h2[:, decim - 1][None, :],    # B[0, m] = h2[m, D-1]
                         jnp.zeros((decim - 1, M), jnp.float32)])
    return jnp.concatenate([a, b], axis=1)  # [D, 2M]


def _fir_body_plane(xplane: jax.Array, ab: jax.Array, decim: int,
                    n_phases: int, precision=None) -> jax.Array:
    """Body outputs from one real plane, zero-copy: the polyphase view
    is an aligned reshape of the input block itself."""
    n_rows = xplane.shape[0] // decim
    z = xplane.reshape(n_rows, decim)
    q = jnp.dot(z, ab, precision=precision or jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # [n_rows, 2M]
    n_body = n_rows - n_phases
    out = jnp.zeros((n_body,), jnp.float32)
    for m in range(n_phases):
        out = out + jax.lax.dynamic_slice_in_dim(q[:, m], m, n_body)
        out = out + jax.lax.dynamic_slice_in_dim(q[:, n_phases + m],
                                                 m + 1, n_body)
    return out


def fir_decimate_tail_block(tail: jax.Array, x: jax.Array,
                            h_rev_pad: jax.Array, decim: int,
                            precision=None) -> jax.Array:
    """Decimating FIR over (carried tail, new block) WITHOUT forming the
    concatenated frame.

    ``tail`` holds the previous TPAD samples (one more than the filter
    history — the extra sample makes the polyphase view of the head
    align to the same widened tap matrix as the body). Values equal
    ``fir_decimate_frame(concat([tail[1:], x]), h, decim)`` up to f32
    term regrouping (last-ulp differences — the widened matmul groups
    products differently than the frame path); WITHIN this path outputs
    ARE bit-identical for every block size, because head and body use
    the identical term grouping:

    * body: ``Zx = x.reshape(N/D, D)`` — an ALIGNED view, no copy —
      contracted against ``[D, 2M]`` taps (the off-by-one of
      ``H = MD-1`` absorbed into a shifted + wrap column pair);
    * head (first M outputs): the same formulation over the tiny
      ``concat(tail, x[:M*D])`` buffer.

    Eliminates the 2x-block-size concat copy per streaming step.
    """
    tpad = h_rev_pad.shape[0]
    n_phases = tpad // decim
    n_out = x.shape[0] // decim
    if n_out <= n_phases or decim < 2 or x.shape[0] % decim:
        # non-multiple-of-decim blocks (or tiny ones) take the frame
        # path, which floors the output count like the reference
        return fir_decimate_frame(jnp.concatenate([tail[1:], x]), h_rev_pad,
                                  decim)
    ab = _fir_body_matrices(h_rev_pad, decim)

    def planar(xp, tp):
        head = _fir_body_plane(jnp.concatenate([tp, xp[:tpad]]), ab, decim,
                               n_phases, precision)
        body = _fir_body_plane(xp, ab, decim, n_phases, precision)
        return jnp.concatenate([head, body])

    if jnp.iscomplexobj(x):
        return jax.lax.complex(planar(x.real, tail.real),
                               planar(x.imag, tail.imag))
    return planar(x, tail).astype(x.dtype)


def _fir_decimate_poly_ctaps(frame: jax.Array, g_rev_pad: jax.Array,
                             decim: int) -> jax.Array:
    """Polyphase decimating FIR with COMPLEX taps (complex frame).

    Same band-sum construction as :func:`_fir_decimate_poly`, with the
    four real contractions of (frame.re/.im) x (taps.re/.im) spelled out
    so each is one MXU matmul.
    """
    tpad = g_rev_pad.shape[0]
    n_phases = tpad // decim
    n_out = (frame.shape[0] - (tpad - 1)) // decim
    n_rows = n_out + n_phases
    pad = n_rows * decim - frame.shape[0]
    if pad > 0:
        frame = jnp.concatenate([frame, jnp.zeros(pad, frame.dtype)])
    z = frame[: n_rows * decim].reshape(n_rows, decim)
    h2 = g_rev_pad.reshape(n_phases, decim)
    hr = h2.real.astype(jnp.float32)
    hi = h2.imag.astype(jnp.float32)

    def mm(a, h):
        return jnp.dot(a, h.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    def band_sum(q):
        return sum(jax.lax.dynamic_slice_in_dim(q[:, m], m, n_out)
                   for m in range(n_phases))

    xr, xi = z.real, z.imag
    yr = band_sum(mm(xr, hr)) - band_sum(mm(xi, hi))
    yi = band_sum(mm(xr, hi)) + band_sum(mm(xi, hr))
    return jax.lax.complex(yr, yi)


def xlating_fir_decimate_frame(frame: jax.Array, h_rev_pad: jax.Array,
                               decim: int, phase0: jax.Array,
                               lo_inc: jax.Array) -> jax.Array:
    """Frequency-translating decimating FIR via the rotated-taps identity.

    Rotate-then-filter, ``y[k] = sum_t h[t] * (x[kD+T-1-t] * lo[kD+T-1-t])``
    (T = len(h_rev_pad), frame carries T-1 history), factors as

        y[k] = lo[kD + T - 1] * sum_t (h[t] * conj(lo_rel[t])) x[...]

    i.e. filter with fixed complex taps ``g = h .* conj(lo ramp)`` and
    rotate only the *decimated* output — the transcendental count drops
    from O(N) (full-rate LO) to O(T + N/D), with the filter still pure
    MXU matmuls. Phase stays the exact uint32 turn arithmetic of
    ``ops.exact``: taps use the relative ramp, outputs use
    ``phase0 + (kD + T - 1) * lo_inc``, so block chaining is identical
    to the rotate-then-filter form (same lo values, f32 rounding aside).
    """
    tpad = h_rev_pad.shape[0]
    n_out = (frame.shape[0] - (tpad - 1)) // decim
    # complex taps: g[t] = h_rev[t] * conj(lo_rel[tpad-1-t]) -> with the
    # reversed layout, tap index t multiplies sample (kD + t), whose LO
    # exponent relative to the output sample (kD + tpad - 1) is
    # (t - (tpad-1)) * inc.
    t_idx = jnp.arange(tpad, dtype=jnp.uint32)
    rel = (t_idx - jnp.uint32(tpad - 1)) * lo_inc.astype(jnp.uint32)
    ang = exact.turns_u32_to_radians(rel)
    g = h_rev_pad.astype(jnp.float32) * jax.lax.complex(jnp.cos(ang),
                                                        jnp.sin(ang))
    yf = _fir_decimate_poly_ctaps(frame, g, decim)
    # decimated output rotation: lo at absolute sample (kD + tpad - 1);
    # frame sample 0 is absolute stream offset -(tpad-1), so exponent =
    # phase0 + kD * inc.
    k = jnp.arange(n_out, dtype=jnp.uint32)
    ph = phase0.astype(jnp.uint32) \
        + k * (jnp.uint32(decim) * lo_inc.astype(jnp.uint32))
    ang_o = exact.turns_u32_to_radians(ph)
    lo_o = jax.lax.complex(jnp.cos(ang_o), jnp.sin(ang_o))
    return yf * lo_o


def prepare_taps(taps: Sequence[float], decim: int) -> np.ndarray:
    """Reverse and left-pad taps to a multiple of decim (see fir_decimate_frame)."""
    h = np.asarray(taps, dtype=np.float32)
    h_rev = h[::-1]
    tpad = int(math.ceil(len(h) / decim)) * decim
    pad = tpad - len(h)
    return np.concatenate([np.zeros(pad, np.float32), h_rev])


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

class FIRDecimator(Block):
    """Decimating FIR with carried filter tail. decim=1 gives a plain FIR."""

    def __init__(self, taps, decim: int = 1, dtype=jnp.complex64, name=None,
                 use_pallas: bool = False):
        super().__init__(name)
        self.decim = int(decim)
        self.use_pallas = use_pallas
        self.h_rev_pad = prepare_taps(taps, self.decim)  # numpy: jit embeds
        # it as a literal (no device constant fetch at trace time)
        self.hist = self.h_rev_pad.shape[0] - 1
        # the carried tail holds TPAD samples (hist + 1): the extra
        # sample lets fir_decimate_tail_block's head share the body's
        # aligned formulation (see its docstring)
        self.tail_len = self.h_rev_pad.shape[0]
        self.dtype = dtype

    def init_state(self):
        return dict(tail=np.zeros((self.tail_len,), self.dtype))

    def _fir(self, frame):
        if self.use_pallas:
            from grbaz_tpu.ops.pallas import fir_decimate_frame_pallas
            return fir_decimate_frame_pallas(frame, self.h_rev_pad, self.decim)
        return fir_decimate_frame(frame, self.h_rev_pad, self.decim)

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        if self.use_pallas or self.decim < 2 or n < self.tail_len \
                or n % self.decim:
            frame = jnp.concatenate([state["tail"][1:], x.data])
            y = self._fir(frame)
            tail = x.data[-self.tail_len:] if n >= self.tail_len else \
                jnp.concatenate([state["tail"], x.data])[-self.tail_len:]
        else:
            # zero-copy body: no 2x-block-size concat per step
            y = fir_decimate_tail_block(state["tail"], x.data,
                                        self.h_rev_pad, self.decim)
            tail = x.data[-self.tail_len:]
        new_state = dict(tail=tail)
        out = x.like(y, count=x.count // self.decim, rate_scale=1.0 / self.decim)
        return new_state, (out,)


class FreqXlatingFIRDecimator(Block):
    """Frequency-translating decimating FIR (gr freq_xlating_fir_filter
    equivalent): rotate the band at ``center_freq`` down to 0 with an
    exact-phase LO, then lowpass+decimate with real taps.

    ``center_freq`` is retunable at runtime via params (the phase
    increment is a uint32; host-side conversion keeps full precision).
    """

    def __init__(self, taps, decim: int, center_freq: float, sample_rate: float,
                 dtype=jnp.complex64, name=None, use_pallas: bool = False,
                 rotate_taps: bool = False, precision: str = "highest",
                 backend: str = "auto", interpret: bool = False):
        super().__init__(name)
        self.decim = int(decim)
        self.use_pallas = use_pallas
        # channelizer backend: 'auto' = the x-aligned Pallas kernel on
        # TPU when the shape qualifies (measured 48 us vs 327 us XLA
        # per 1M block on v5e — the XLA body is bound by its
        # HBM-materialized partial products; the kernel keeps them in
        # VMEM and reads x's own plane views, zero copies), 'xla', or
        # 'pallas_xal' to force the kernel. CPU tests force 'xla'
        # unless interpret=True.
        if backend not in ("auto", "xla", "pallas_xal"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.interpret = bool(interpret)
        self.precision_name = precision
        # matmul decomposition for the polyphase contraction: 'highest'
        # = full f32-quality passes (bit-parity with the serial mirror);
        # 'default' = 1-pass bf16 (~54 dB SNR, beyond an 8-bit ADC
        # source's floor, and measured +10% on the whole WBFM chain)
        self.precision = dict(
            highest=jax.lax.Precision.HIGHEST,
            high=jax.lax.Precision.HIGHEST,
            default=jax.lax.Precision.DEFAULT)[precision]
        # rotate_taps: filter with complex modulated taps and rotate only
        # the decimated output (see xlating_fir_decimate_frame) — same
        # result, O(N/decim) instead of O(N) transcendentals.
        self.rotate_taps = bool(rotate_taps)
        self.h_rev_pad = prepare_taps(taps, self.decim)  # numpy: jit embeds
        # it as a literal (no device constant fetch at trace time)
        self.hist = self.h_rev_pad.shape[0] - 1
        self.tail_len = self.h_rev_pad.shape[0]  # see FIRDecimator
        self.dtype = dtype
        self.sample_rate = float(sample_rate)
        self.center_freq0 = float(center_freq)

    def init_state(self):
        return dict(tail=np.zeros((self.tail_len,), self.dtype),
                    phase=np.uint32(0))

    def init_params(self):
        return dict(lo_inc=exact.freq_to_turns_u32(
            -self.center_freq0, self.sample_rate))

    @staticmethod
    def freq_params(center_freq: float, sample_rate: float):
        """Host helper: params for retuning to a new center frequency."""
        return dict(lo_inc=exact.freq_to_turns_u32(-center_freq, sample_rate))

    def _use_xal(self, n: int) -> bool:
        from grbaz_tpu.ops.pallas.wbfm_frontend import supported
        if self.backend == "xla" or self.rotate_taps:
            return False
        if not (supported(n, self.decim) and n % 128 == 0):
            return False
        tpad = self.h_rev_pad.shape[0]
        if (tpad // self.decim + 1) > 8 * (128 // self.decim):
            return False
        if self.backend == "pallas_xal":
            return True
        return jax.default_backend() in ("tpu", "axon")

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        if self.rotate_taps:
            # tail carries UNROTATED samples; the LO lives in the taps +
            # a decimated output rotation. Phase advances identically.
            frame = jnp.concatenate([state["tail"][1:], x.data])
            y = xlating_fir_decimate_frame(frame, self.h_rev_pad,
                                           self.decim, state["phase"],
                                           params["lo_inc"])
            phase_after = state["phase"].astype(jnp.uint32) \
                + jnp.uint32(n) * params["lo_inc"].astype(jnp.uint32)
            tail = x.data[-self.tail_len:] if n >= self.tail_len else \
                jnp.concatenate([state["tail"], x.data])[-self.tail_len:]
        elif self._use_xal(n):
            # x-aligned Pallas kernel: tail carries UNROTATED samples
            # (the LO is synthesized inside the kernel from the carried
            # uint32 phase — same turn arithmetic, outputs equal to the
            # XLA path at f32-regrouping level, tested)
            from grbaz_tpu.ops.pallas.wbfm_frontend import \
                xlating_fir_block_pallas_xal
            y = xlating_fir_block_pallas_xal(
                x.data, state["tail"], self.h_rev_pad, self.decim,
                state["phase"], params["lo_inc"],
                precision=self.precision_name, interpret=self.interpret)
            phase_after = state["phase"].astype(jnp.uint32) \
                + jnp.uint32(n) * params["lo_inc"].astype(jnp.uint32)
            tail = x.data[-self.tail_len:]
        else:
            # tail carries ROTATED samples
            lo, phase_after = exact.oscillator(n, state["phase"],
                                               params["lo_inc"])
            xr = x.data * lo
            if self.use_pallas:
                from grbaz_tpu.ops.pallas import fir_decimate_frame_pallas
                frame = jnp.concatenate([state["tail"][1:], xr])
                y = fir_decimate_frame_pallas(frame, self.h_rev_pad,
                                              self.decim)
            elif self.decim >= 2 and n >= self.tail_len \
                    and n % self.decim == 0:
                # zero-copy body: the rotate fuses into the body matmul
                y = fir_decimate_tail_block(state["tail"], xr,
                                            self.h_rev_pad, self.decim,
                                            precision=self.precision)
            else:
                frame = jnp.concatenate([state["tail"][1:], xr])
                y = fir_decimate_frame(frame, self.h_rev_pad, self.decim)
            tail = xr[-self.tail_len:] if n >= self.tail_len else \
                jnp.concatenate([state["tail"], xr])[-self.tail_len:]
        new_state = dict(tail=tail, phase=phase_after)
        out = x.like(y, count=x.count // self.decim, rate_scale=1.0 / self.decim)
        return new_state, (out,)


# ---------------------------------------------------------------------------
# FFT overlap-save convolution (long filters)
# ---------------------------------------------------------------------------

def fft_fir_frame(frame: jax.Array, h_rev_pad: jax.Array, decim: int = 1,
                  fft_size: int | None = None) -> jax.Array:
    """Overlap-save FFT convolution with :func:`fir_decimate_frame`
    semantics: ``y[k] = sum_t h_rev_pad[t] * frame[k*decim + t]`` over a
    frame with ``tpad-1`` leading history.

    The time-domain polyphase matmul wins on the MXU for channel-filter
    sizes (~100-200 taps); for LONG filters — matched filters, sync
    correlators (the reference's baz_correlator loads arbitrary-length
    patterns), channel-sorting banks — work per output grows as O(L)
    while overlap-save stays O(log F). Crossover measured around
    L ~ 1k taps. Segments are batched so the FFTs run as one batched
    transform.
    """
    tpad = h_rev_pad.shape[0]
    n_new = frame.shape[0] - (tpad - 1)
    n_full = n_new  # full-rate outputs before decimation
    if fft_size is None:
        fft_size = max(256, 1 << int(math.ceil(math.log2(4 * tpad))))
    F = int(fft_size)
    if F < 2 * tpad:
        raise ValueError("fft_size must be >= 2x the tap count")
    S = F - (tpad - 1)  # valid outputs per segment
    n_seg = -(-n_full // S)
    total = (tpad - 1) + n_seg * S
    pad = total - frame.shape[0]
    fc = frame.astype(jnp.complex64)
    if pad > 0:
        fc = jnp.concatenate([fc, jnp.zeros(pad, jnp.complex64)])
    # segment j covers outputs [j*S, (j+1)*S): needs frame[j*S : j*S + F]
    starts = jnp.arange(n_seg, dtype=jnp.int32) * S
    segs = fc[starts[:, None] + jnp.arange(F, dtype=jnp.int32)[None, :]]
    # y[k] = sum_t h_rev[t] frame[k+t] = conv(frame, g)[k + tpad - 1]
    # with g[u] = h_rev[tpad-1-u]; in segment-local coords the valid
    # outputs sit at [tpad-1, F).
    g = h_rev_pad[::-1].astype(jnp.complex64)
    hf = jnp.fft.fft(g, n=F)
    yseg = jnp.fft.ifft(jnp.fft.fft(segs, axis=1) * hf[None, :], axis=1)
    y = yseg[:, tpad - 1:].reshape(-1)[:n_full]
    if decim > 1:
        y = y[::decim][: n_full // decim]  # floor, matching the
        # polyphase path's output count
    if not jnp.iscomplexobj(frame):
        return y.real.astype(frame.dtype)
    return y.astype(frame.dtype)
