"""Audio FMCW radar — capability parity with the reference demo
flowgraph (/root/reference/examples/Audio FMCW.grc: sawtooth sweep ->
VCO chirp -> audio out; audio in -> multiply-conjugate deramp ->
stream_to_vector -> FFT -> |.| -> nlog10 -> waterfall/plot sinks).

TPU-native design: the chirp is NOT a sequential VCO loop — within a
sweep of ``P`` samples the phase is the closed-form quadratic

    phase(k) = inc0*k + dinc*k*(k-1)/2      (mod 2^32 turns)

evaluated vectorised in exact uint32 modular arithmetic (same drift-free
integer-turns scheme as ops/exact.py), so chirp synthesis, deramp and
the per-sweep range FFT all fuse into one XLA program.  The only carry
is the global sample counter (sweep alignment across blocks).

Flowgraph surface:
    input  "rx"     float audio from the microphone path
    output "range"  (n_sweeps, P//2+1) log-magnitude range profiles
    output "tx"     float chirp for the speaker path (same timeline)
    output "beat"   deramped complex baseband (diagnostics)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.graph import Flowgraph
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.exact import freq_to_turns_u32


@dataclasses.dataclass
class FMCWConfig:
    sample_rate: float = 48e3
    f0: float = 2e3            # sweep start (audio band, like the demo)
    f1: float = 8e3            # sweep end
    sweep_period: int = 1024   # samples per sweep (P)
    block_size: int = 8192     # must be a multiple of sweep_period
    wave_speed: float = 343.0  # m/s (sound; use c for RF captures)

    @property
    def n_sweeps(self) -> int:
        return self.block_size // self.sweep_period

    def range_resolution(self) -> float:
        """Metres per beat-frequency bin: v / (2 * sweep_bandwidth)."""
        return self.wave_speed / (2.0 * (self.f1 - self.f0))

    def bin_to_range(self, beat_bin: float) -> float:
        """Round-trip range for an FFT beat bin (one sweep = one FFT)."""
        return float(beat_bin) * self.range_resolution()

    def delay_to_bin(self, delay_samples: float) -> float:
        """Expected beat bin for an echo delayed by ``delay_samples``."""
        return float(delay_samples) * (self.f1 - self.f0) / self.sample_rate


def chirp_phase_u32(k: jnp.ndarray, cfg: FMCWConfig) -> jnp.ndarray:
    """Exact u32 phase (turns) at intra-sweep index ``k`` (uint32)."""
    inc0 = jnp.uint32(freq_to_turns_u32(cfg.f0, cfg.sample_rate))
    inc1 = jnp.uint32(freq_to_turns_u32(cfg.f1, cfg.sample_rate))
    dinc = ((inc1 - inc0).astype(jnp.uint32) *
            np.uint32(np.round(2**32 / cfg.sweep_period).astype(np.uint64)
                      & 0xFFFFFFFF))
    # dinc above would lose exactness; instead scale per-sample:
    # phase(k) = inc0*k + step*k*(k-1)/2, step = (inc1-inc0)/P rounded.
    step = jnp.uint32(np.uint32(
        (int(freq_to_turns_u32(cfg.f1, cfg.sample_rate))
         - int(freq_to_turns_u32(cfg.f0, cfg.sample_rate)))
        % (1 << 32) // cfg.sweep_period))
    k = k.astype(jnp.uint32)
    tri = (k * (k - jnp.uint32(1)) // jnp.uint32(2)).astype(jnp.uint32)
    del dinc
    return (inc0 * k + step * tri).astype(jnp.uint32)


def chirp_iq(global_idx: jnp.ndarray, cfg: FMCWConfig) -> jnp.ndarray:
    """Complex chirp samples for absolute sample indices (sawtooth FM,
    phase reset each sweep start — VCO equivalent of the demo)."""
    k = jnp.mod(global_idx.astype(jnp.uint32),
                jnp.uint32(cfg.sweep_period))
    ph = chirp_phase_u32(k, cfg)
    ang = ph.astype(jnp.float32) * np.float32(2 * np.pi / 2**32)
    return jax.lax_cos_sin(ang) if False else (
        jnp.cos(ang) + 1j * jnp.sin(ang)).astype(jnp.complex64)


import jax  # noqa: E402  (used by jit-traced helpers above)


class ChirpDeramp(Block):
    """rx float -> (beat complex, tx float).

    Generates the transmit chirp for the block's absolute sample span
    and mixes the received audio against its conjugate (the demo's
    ``blocks_multiply_conjugate_cc``), yielding the beat signal whose
    frequency encodes round-trip delay.
    """

    n_in, n_out = 1, 2

    def __init__(self, cfg: FMCWConfig, name=None):
        super().__init__(name)
        self.cfg = cfg

    def init_state(self):
        return jnp.uint32(0)   # global sample counter (sweep alignment)

    def apply(self, state, params, rx: Stream):
        n = rx.data.shape[0]
        idx = state + jnp.arange(n, dtype=jnp.uint32)
        tx = chirp_iq(idx, self.cfg)
        beat = (rx.data.astype(jnp.float32) * jnp.conj(tx)
                ).astype(jnp.complex64)
        new_state = (state + jnp.uint32(n)).astype(jnp.uint32)
        return new_state, (
            rx.replace(data=beat),
            rx.replace(data=jnp.real(tx).astype(jnp.float32)),
        )


class RangeFFT(Block):
    """Sweep-aligned range profiles: reshape the beat signal into
    (n_sweeps, P), window, FFT, log magnitude (the demo's
    stream_to_vector -> fft_vxx -> complex_to_mag -> nlog10 chain)."""

    def __init__(self, cfg: FMCWConfig, name=None):
        super().__init__(name)
        if cfg.block_size % cfg.sweep_period:
            raise ValueError("block_size must be a multiple of sweep_period")
        self.cfg = cfg
        self.window = jnp.asarray(
            np.hanning(cfg.sweep_period).astype(np.float32))

    def apply(self, state, params, beat: Stream):
        P = self.cfg.sweep_period
        frames = beat.data.reshape(-1, P) * self.window
        spec = jnp.fft.fft(frames, axis=-1)[:, :P // 2 + 1]
        mag = jnp.abs(spec).astype(jnp.float32)
        logmag = 10.0 * jnp.log10(mag + 1e-12)
        out = beat.replace(data=logmag,
                           count=jnp.int32(frames.shape[0]))
        return state, (out,)


def build_fmcw(cfg: FMCWConfig):
    """Wire the FMCW flowgraph; returns (flowgraph, handles)."""
    fg = Flowgraph("fmcw")
    deramp = ChirpDeramp(cfg, name="deramp")
    rfft = RangeFFT(cfg, name="range")
    fg.input("rx", deramp)
    fg.connect(deramp, rfft, out_port=0)
    fg.output("beat", deramp, port=0)
    fg.output("tx", deramp, port=1)
    fg.output("range", rfft)
    return fg, dict(deramp=deramp, range=rfft)


def simulate_echo(cfg: FMCWConfig, n: int, delay_samples: int,
                  atten: float = 0.5, noise: float = 0.0,
                  seed: int = 0) -> np.ndarray:
    """Synthesize a received audio block: direct chirp echo delayed by
    ``delay_samples`` (+ optional noise) — loopback test-signal source."""
    idx = np.arange(n, dtype=np.uint64)
    k = (idx - delay_samples) % cfg.sweep_period
    valid = idx >= delay_samples
    inc0 = int(freq_to_turns_u32(cfg.f0, cfg.sample_rate))
    step = ((int(freq_to_turns_u32(cfg.f1, cfg.sample_rate)) - inc0)
            % (1 << 32)) // cfg.sweep_period
    ph = (inc0 * k + step * (k * (k - 1) // 2)) % (1 << 32)
    tx_del = np.cos(ph.astype(np.float64) * (2 * np.pi / 2**32))
    rng = np.random.default_rng(seed)
    out = atten * tx_del * valid
    if noise:
        out = out + rng.normal(0, noise, n)
    return out.astype(np.float32)
