"""WBFM broadcast receiver — the flagship chain (RTL-FM equivalent).

Capability parity with the reference's flagship flowgraph
(/root/reference/samples/RTL-FM.grc; call stack SURVEY.md §3.1):

    rtl source (3.2 MHz IQ) -> freq_xlating_fir (channel select, /8)
      -> power squelch -> FM quadrature demod
      -> fractional resample to audio rate -> deemphasis -> audio

Here the whole chain is ONE XLA program over sample blocks. Factory
functions return a wired :class:`Flowgraph` plus the blocks whose params
the control plane typically touches (tuning, squelch, ratio).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.graph import Flowgraph
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.demod import FMDeemphasis, PowerSquelch, QuadratureDemod
from grbaz_tpu.ops.fir import (FreqXlatingFIRDecimator, low_pass_taps,
                               prepare_taps)
from grbaz_tpu.ops.resampler import FractionalResampler

from grbaz_tpu.ops.iir import onepole_scan, state_at_count


class WBFMFrontend(Block):
    """Fused channelizer + (optional squelch) + FM discriminator.

    One Pallas kernel computes the frequency-translating decimating FIR
    with the LO folded into banded tap matrices and every intermediate in
    VMEM (:mod:`grbaz_tpu.ops.pallas.wbfm_frontend`); the output-side LO
    rotation cancels into the discriminator's constant phase offset, so
    no full-rate transcendentals run at all. Capability parity with the
    reference flagship chain's first three blocks
    (/root/reference/samples/RTL-FM.grc: freq_xlating_fir_filter ->
    pwr_squelch_cc -> quadrature_demod_cf).

    ``backend``: 'auto' (Pallas on TPU, XLA elsewhere), 'pallas', 'xla'.
    The XLA path uses the same rotated-taps identity and is numerically
    equivalent (tested) — it is the CPU-test / odd-shape fallback.

    Squelch note: the power gate acts on the *unrotated* channel signal;
    ``|yf| == |y_rotated|``, so gating commutes with the deferred
    rotation and matches the unfused chain.
    """

    def __init__(self, taps, decim: int, center_freq: float,
                 sample_rate: float, gain: float, *,
                 squelch_db: Optional[float] = None,
                 squelch_alpha: float = 1e-4,
                 backend: str = "auto", precision: str = "high",
                 interpret: bool = False, name=None):
        super().__init__(name)
        self.decim = int(decim)
        self.h_rev_pad = prepare_taps(taps, self.decim)
        self.tail_len = self.h_rev_pad.shape[0]
        self.sample_rate = float(sample_rate)
        self.center_freq0 = float(center_freq)
        self.gain0 = float(gain)
        self.squelch_db = squelch_db
        self.squelch_alpha = float(squelch_alpha)
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.precision = precision
        self.interpret = interpret

    def init_state(self):
        st = dict(tail=np.zeros((self.tail_len,), np.complex64),
                  phase=np.uint32(0),
                  prev_yf=np.complex64(1.0 + 0.0j))
        if self.squelch_db is not None:
            st["sq_avg"] = np.float32(0.0)
        return st

    def init_params(self):
        pr = dict(lo_inc=exact.freq_to_turns_u32(-self.center_freq0,
                                                 self.sample_rate),
                  gain=np.float32(self.gain0))
        if self.squelch_db is not None:
            pr["sq_threshold"] = np.float32(
                10.0 ** (float(self.squelch_db) / 10.0))
            pr["sq_alpha"] = np.float32(self.squelch_alpha)
        return pr

    @staticmethod
    def freq_params(center_freq: float, sample_rate: float):
        return dict(lo_inc=exact.freq_to_turns_u32(-center_freq, sample_rate))

    def _use_pallas(self, n_new: int) -> bool:
        from grbaz_tpu.ops.pallas.wbfm_frontend import supported
        if not supported(n_new, self.decim):
            return False
        if self.backend == "pallas":
            return True
        if self.backend == "xla":
            return False
        return jax.default_backend() in ("tpu", "axon")

    def apply(self, state, params, x: Stream):
        from grbaz_tpu.ops.pallas import wbfm_frontend as wf
        n = x.data.shape[0]
        frame = jnp.concatenate([state["tail"][1:], x.data])
        lo_inc = params["lo_inc"]
        if self._use_pallas(n):
            yf = wf.xlating_fir_frame_pallas(
                frame, self.h_rev_pad, self.decim, lo_inc,
                precision=self.precision, interpret=self.interpret)
        else:
            # same rotated-taps identity, XLA polyphase matmuls, same
            # (unrotated) output convention — identical g construction.
            from grbaz_tpu.ops.fir import _fir_decimate_poly_ctaps
            g = wf.rotated_taps(jnp.asarray(self.h_rev_pad, jnp.float32),
                                lo_inc)
            yf = _fir_decimate_poly_ctaps(frame, g, self.decim)
        new_state = dict(state)
        if self.squelch_db is not None:
            p = yf.real * yf.real + yf.imag * yf.imag
            n_q = p.shape[0]
            count_q = x.count // self.decim
            valid = jnp.arange(n_q, dtype=jnp.int32) < count_q
            # constant-pole recurrence as triangular matmuls (ops.iir):
            # causality keeps the valid prefix exact; tail overwritten
            # with the last valid average (old masked-scan semantics)
            avg_raw = onepole_scan(p.astype(jnp.float32)
                                   * params["sq_alpha"],
                                   1.0 - params["sq_alpha"],
                                   state["sq_avg"])
            avg_last = state_at_count(avg_raw, count_q, state["sq_avg"])
            avg = jnp.where(valid, avg_raw, avg_last)
            yf = jnp.where(avg >= params["sq_threshold"], yf,
                           jnp.zeros((), yf.dtype))
            new_state["sq_avg"] = avg_last
        d, last_yf = wf.demod_unrotated(yf, state["prev_yf"], params["gain"],
                                        lo_inc, self.decim)
        n_out_count = x.count // self.decim
        idx = jnp.clip(n_out_count - 1, 0, d.shape[0] - 1)
        new_state.update(
            tail=x.data[-self.tail_len:] if n >= self.tail_len else
            jnp.concatenate([state["tail"], x.data])[-self.tail_len:],
            phase=state["phase"].astype(jnp.uint32)
            + jnp.uint32(n) * lo_inc.astype(jnp.uint32),
            prev_yf=jnp.where(n_out_count > 0, yf[idx], state["prev_yf"]))
        out = x.like(d, count=n_out_count, rate_scale=1.0 / self.decim)
        return new_state, (out,)


@dataclasses.dataclass
class WBFMConfig:
    sample_rate: float = 3.2e6      # RTL2832 full rate (lib/rtl2832.cc:59-60)
    center_freq: float = 0.0        # station offset within the band
    decim: int = 8                  # -> quad rate
    audio_rate: float = 48e3
    max_deviation: float = 75e3     # broadcast FM
    channel_width: float = 150e3
    transition: float = 75e3
    squelch_db: Optional[float] = None  # None = no squelch block
    deemph_tau: float = 75e-6
    block_size: int = 1 << 17
    # rotated-taps channelizer: LO folded into complex taps + decimated
    # output rotation (ops/fir.xlating_fir_decimate_frame) — same
    # output, O(N/decim) instead of O(N) transcendentals. Honest A/B on
    # v5e (r4, DCE-proof fence): rotate-then-filter 1637 Msamp/s chain
    # vs 1220 with rotated taps — the complex-tap path's 4 matmuls cost
    # more than the full-rate oscillator saves, so False stays default.
    rotate_taps: bool = False
    # fused front end: channelizer + squelch + FM discriminator in one
    # block, using the v3 rotated-taps Pallas kernel on TPU. Default
    # False — since r5 the UNFUSED path already runs the v5 x-aligned
    # Pallas channelizer (chan_backend='auto' below, 48 us/1M block vs
    # 327 XLA), so fusion no longer buys the chain anything; the fused
    # block remains for squelch-in-kernel use and is fully tested
    # (interpret + real mode).
    fused: bool = False
    # Mosaic matmul decomposition for the fused kernel: 'high' now
    # aliases lax.Precision.HIGHEST on the Pallas path (full f32-quality
    # ~6-pass decomposition — Mosaic's dot lowering rejects HIGH) or
    # 'default' (1-pass bf16, ~54 dB SNR — the RTL dongles' 8-bit ADC
    # floor).
    fused_precision: str = "high"
    # kernel backend for the fused front-end block: 'auto' (Pallas on
    # TPU), 'pallas', or 'xla' (rotated-taps polyphase — the fastest
    # measured path on v5e under honest fetch-forced timing, r3).
    fused_backend: str = "auto"
    # audio-rate conversion structure: 'fractional' = the single
    # MMSE fractional resampler at quad rate (the reference's
    # fractional_resampler_cc shape — and its aliasing behavior: an
    # 8-tap interpolator is not an anti-alias filter for an 8.3x rate
    # drop); 'cascade' = anti-alias FIR decimation by floor(quad/audio)
    # on the polyphase-matmul machine, then the fractional resampler
    # for the small residual ratio (25/24 for the flagship numbers) at
    # 1/8 the rate. The cascade both filters properly and cuts the
    # resampler stage ~5x (the fractional stage's cost scales with its
    # output capacity; measured r5: 230 us -> ~40 us per 1M chain
    # block). Default 'fractional' for exact behavior parity with
    # earlier rounds; the flagship bench runs 'cascade'.
    audio_chain: str = "fractional"
    # cascade integer pre-decimation factor; None = floor(quad/audio).
    # Audio-path SINAD on a clean tone (blackman-harris-windowed
    # estimator — a hann ±3-bin estimator reads its own ~-45 dB leakage
    # floor, a trap that burned r5's first quality A/B): AA alone 98 dB;
    # cascade 71 dB (d2=8) / 76 dB (d2=4) vs single-stage fractional
    # 78 dB — all far beyond the RTL source's 8-bit (~50 dB) floor, and
    # the cascade actually FILTERS the 24k..200k demod noise that the
    # single MMSE stage aliases into the audio band on real signals.
    audio_aa_decim: Optional[int] = None
    # unfused channelizer backend: 'auto' = the x-aligned Pallas kernel
    # on TPU (r5: 48 us vs 327 us XLA per 1M block — the XLA body is
    # HBM-bound on its materialized partial products; the kernel keeps
    # them in VMEM and reads x's plane views with zero copies), 'xla'
    # to force the polyphase-matmul path (CPU default), 'pallas_xal'
    # to force the kernel.
    chan_backend: str = "auto"
    # channel-FIR matmul decomposition: 'default' = 1-pass bf16 — the
    # RTL source is an 8-bit ADC (~50 dB floor) and the bf16 filter
    # holds ~54 dB SNR, so full-f32 passes buy nothing the source can
    # deliver; measured +10% chain throughput on v5e (1791 vs 1630
    # Msamp/s). 'highest' restores full f32-quality contraction
    # (bit-parity with the serial golden mirrors).
    chan_precision: str = "default"


def build_wbfm(cfg: WBFMConfig):
    """Build the mono WBFM receive flowgraph.

    Returns ``(flowgraph, handles)`` where handles is a dict of the
    retunable blocks: ``channel`` (freq), ``squelch``, ``resampler``.
    """
    fs, decim = cfg.sample_rate, cfg.decim
    quad = fs / decim
    if cfg.block_size % decim:
        raise ValueError("block_size must be a multiple of decim")
    fg = Flowgraph("wbfm")
    if cfg.fused:
        front = WBFMFrontend(
            low_pass_taps(1.0, fs, cfg.channel_width / 2 + cfg.transition / 2,
                          cfg.transition),
            decim, cfg.center_freq, fs,
            quad / (2 * np.pi * cfg.max_deviation),
            squelch_db=cfg.squelch_db, precision=cfg.fused_precision,
            backend=cfg.fused_backend, name="frontend")
        resamp = FractionalResampler(cfg.block_size // decim,
                                     quad / cfg.audio_rate,
                                     dtype=jnp.float32, name="resampler")
        deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)
        fg.input("iq", front)
        fg.chain(front, resamp, deemph)
        fg.output("audio", deemph)
        fg.output("quad", front)  # demodulated quad-rate tap (scanner use)
        return fg, dict(channel=front, resampler=resamp, frontend=front)
    chan = FreqXlatingFIRDecimator(
        low_pass_taps(1.0, fs, cfg.channel_width / 2 + cfg.transition / 2,
                      cfg.transition),
        decim, cfg.center_freq, fs, name="channel",
        rotate_taps=cfg.rotate_taps, precision=cfg.chan_precision,
        backend=cfg.chan_backend)
    demod = QuadratureDemod(quad / (2 * np.pi * cfg.max_deviation))
    deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)
    fg.input("iq", chan)
    handles = dict(channel=chan)

    d2 = cfg.audio_aa_decim or int(quad // cfg.audio_rate)
    use_cascade = (cfg.audio_chain == "cascade" and d2 >= 2
                   and (cfg.block_size // decim) % d2 == 0)
    if cfg.audio_chain == "cascade" and not use_cascade:
        raise ValueError("cascade audio chain needs quad/audio >= 2 and "
                         "a block divisible by the integer factor")
    if use_cascade:
        from grbaz_tpu.ops.fir import FIRDecimator
        mid = quad / d2
        aa = FIRDecimator(
            low_pass_taps(1.0, quad, 0.45 * cfg.audio_rate,
                          0.2 * cfg.audio_rate, window="blackmanharris"),
            d2, dtype=jnp.float32, name="audio_aa")
        resamp = FractionalResampler(cfg.block_size // decim // d2,
                                     mid / cfg.audio_rate,
                                     dtype=jnp.float32, name="resampler")
        audio_stages = [aa, resamp]
        handles["audio_aa"] = aa
    else:
        resamp = FractionalResampler(cfg.block_size // decim,
                                     quad / cfg.audio_rate,
                                     dtype=jnp.float32, name="resampler")
        audio_stages = [resamp]
    handles["resampler"] = resamp

    if cfg.squelch_db is not None:
        sq = PowerSquelch(cfg.squelch_db, name="squelch")
        fg.chain(chan, sq, demod, *audio_stages, deemph)
        handles["squelch"] = sq
    else:
        fg.chain(chan, demod, *audio_stages, deemph)
    fg.output("audio", deemph)
    fg.output("quad", demod)  # demodulated quad-rate tap (scanner use)
    return fg, handles
