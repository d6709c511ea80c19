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
import jax.numpy as jnp

from grbaz_tpu.core.graph import Flowgraph
from grbaz_tpu.ops.demod import FMDeemphasis, PowerSquelch, QuadratureDemod
from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator, low_pass_taps
from grbaz_tpu.ops.resampler import FractionalResampler


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
    # output rotation (ops/fir.xlating_fir_decimate_frame) — same output,
    # O(N/decim) instead of O(N) transcendentals. Measured equal to the
    # rotate-then-filter path on v5e (the chain is HBM-bound, not
    # VPU-bound), so the simpler path stays the default.
    rotate_taps: bool = False


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
    chan = FreqXlatingFIRDecimator(
        low_pass_taps(1.0, fs, cfg.channel_width / 2 + cfg.transition / 2,
                      cfg.transition),
        decim, cfg.center_freq, fs, name="channel",
        rotate_taps=cfg.rotate_taps)
    demod = QuadratureDemod(quad / (2 * np.pi * cfg.max_deviation))
    resamp = FractionalResampler(cfg.block_size // decim, quad / cfg.audio_rate,
                                 dtype=jnp.float32, name="resampler")
    deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)
    fg.input("iq", chan)
    handles = dict(channel=chan, resampler=resamp)
    if cfg.squelch_db is not None:
        sq = PowerSquelch(cfg.squelch_db, name="squelch")
        fg.chain(chan, sq, demod, resamp, deemph)
        handles["squelch"] = sq
    else:
        fg.chain(chan, demod, resamp, deemph)
    fg.output("audio", deemph)
    fg.output("quad", demod)  # demodulated quad-rate tap (scanner use)
    return fg, handles
