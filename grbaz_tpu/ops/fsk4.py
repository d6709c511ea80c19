"""4-level FSK (C4FM) symbol demodulator — the OP25 front half.

Behavioral equivalent of the op25 fsk4 demodulator the reference wraps
(python/baz_op25.py:41-75 ``op25_fsk4``: FM-discriminated floats in,
4-level symbols out at 4800 baud).

TPU-first design: instead of the op25 per-sample timing loop, symbol
timing is recovered *block-parallel* with a polyphase eye metric:

1. resample the discriminator stream to S samples/symbol (exact MMSE
   resampler machinery, S=8);
2. frame into [n_sym, S] (with a carried partial-symbol buffer so block
   boundaries are seamless);
3. per block, score every sampling phase by its eye quality — the mean
   distance of samples to the nearest of the 4 C4FM levels (levels
   derived from a robust scale estimate) — and pick the best, with
   hysteresis across blocks so a stable clock never jitters;
4. slice the chosen phase to dibits (P25 mapping +3,+1,-1,-3 ->
   01,00,10,11).

Everything is batched vector math; no sequential per-symbol loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import TAPS_TABLE
from grbaz_tpu.ops.resampler import HIST, resample_block

P25_SYMBOL_RATE = 4800.0
SPS = 8  # internal oversampling (samples per symbol)


class FSK4Demod(Block):
    """float discriminator stream -> (dibits uint8, soft symbols f32)."""

    n_out = 2

    def __init__(self, channel_rate: float,
                 symbol_rate: float = P25_SYMBOL_RATE,
                 phase_hysteresis: float = 0.05, name=None):
        super().__init__(name)
        self.channel_rate = float(channel_rate)
        self.symbol_rate = float(symbol_rate)
        self.ratio = channel_rate / (SPS * symbol_rate)
        if self.ratio < 0.5:
            raise ValueError("channel rate too low for 8x oversampling")
        self.hyst = float(phase_hysteresis)

    def init_state(self):
        return dict(
            tail=np.zeros((HIST,), np.float32),
            mu_int=np.int32(HIST), mu_frac=np.uint32(0),
            buf=np.zeros((SPS,), np.float32),   # partial symbol carry
            buf_count=np.int32(0),
            phase=np.int32(0),                   # chosen sampling phase
            scale=np.float32(0.0),               # eye scale EWMA
        )

    def init_params(self):
        ip, fr = exact.ratio_to_fixed(self.ratio)
        return dict(inc_int=ip, inc_frac=fr,
                    scale_rate=np.float32(0.1))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        cap = int(np.ceil(n / (self.ratio * 0.9))) + 2
        frame = jnp.concatenate([state["tail"], x.data.astype(jnp.float32)])
        hi_rate, n2, mu_int, mu_frac = resample_block(
            frame, state["mu_int"], state["mu_frac"],
            params["inc_int"], params["inc_frac"], cap,
            TAPS_TABLE, n_valid=jnp.minimum(x.count, n))

        # --- frame into symbols with the carried partial buffer ---
        # valid layout target: contiguous[i] = buf[i] for i < buf_count,
        # then hi_rate[i - buf_count]
        total_cap = SPS + cap
        bc = state["buf_count"]
        shift = SPS - bc
        rolled_hi = jnp.roll(
            jnp.concatenate([jnp.zeros((SPS,), jnp.float32), hi_rate]),
            -shift)
        padded_buf = jnp.concatenate(
            [state["buf"], jnp.zeros((cap,), jnp.float32)])
        stream_buf = jnp.where(
            jnp.arange(total_cap, dtype=jnp.int32) < bc,
            padded_buf, rolled_hi)
        total = bc + n2
        max_sym = total_cap // SPS
        n_sym = total // SPS
        sym_mat = stream_buf[: max_sym * SPS].reshape(max_sym, SPS)
        sym_valid = jnp.arange(max_sym, dtype=jnp.int32) < n_sym

        # --- leftover carry for next block ---
        rem = total - n_sym * SPS
        rem_start = n_sym * SPS
        idx = rem_start + jnp.arange(SPS, dtype=jnp.int32)
        new_buf = jnp.where(jnp.arange(SPS) < rem,
                            stream_buf[jnp.clip(idx, 0, total_cap - 1)], 0.0)

        # --- robust scale: mean |x| over valid symbols (outer levels
        # dominate: E|x| = (0.5+1.5)/2 * scale for uniform dibits) ---
        vmask = sym_valid[:, None]
        mean_abs = jnp.sum(jnp.abs(sym_mat) * vmask) / jnp.maximum(
            jnp.sum(vmask) * SPS, 1)
        sr = params["scale_rate"]
        scale = jnp.where(state["scale"] > 0,
                          (1 - sr) * state["scale"] + sr * mean_abs,
                          mean_abs)
        unit = jnp.maximum(scale, 1e-9)  # ~ mean|level| = 1.0 nominal

        # --- eye metric per phase: distance to nearest of 4 levels ---
        levels = jnp.asarray([-1.5, -0.5, 0.5, 1.5], jnp.float32) * unit
        d = jnp.abs(sym_mat[:, :, None] - levels[None, None, :])
        resid = jnp.min(d, axis=2)                       # [max_sym, S]
        score = jnp.sum(resid * vmask, axis=0) / jnp.maximum(
            jnp.sum(sym_valid), 1)                       # [S]
        best = jnp.argmin(score).astype(jnp.int32)
        keep = score[state["phase"]] <= score[best] * (1.0 + self.hyst)
        phase = jnp.where(keep, state["phase"], best)

        soft = jnp.take(sym_mat, phase, axis=1) / unit
        soft = jnp.where(sym_valid, soft, 0.0)
        # P25 mapping +3,+1,-1,-3 -> 01,00,10,11
        dibits = jnp.where(soft > 1.0, 1,
                           jnp.where(soft > 0.0, 0,
                                     jnp.where(soft > -1.0, 2, 3))).astype(jnp.uint8)
        dibits = jnp.where(sym_valid, dibits, 0).astype(jnp.uint8)

        new_state = dict(
            tail=frame[-HIST:], mu_int=mu_int, mu_frac=mu_frac,
            buf=new_buf, buf_count=rem, phase=phase, scale=scale)
        rate_scale = self.symbol_rate / self.channel_rate
        return new_state, (
            x.like(dibits, count=n_sym, rate_scale=rate_scale),
            x.like(soft.astype(jnp.float32), count=n_sym,
                   rate_scale=rate_scale))
