"""Bit-level decoders: Manchester, DPLL bit sync, ACARS, FasTrak.

These are the reference's sequential per-sample/per-bit FSMs
(SURVEY.md §2.1 Detectors/decoders), expressed as ``lax.scan`` bodies
with explicit carry state, variable-count outputs compacted by
cumsum-scatter, and packet emissions as fixed-capacity event arrays.
They run at symbol/bit rate (kHz), so scan serialization is irrelevant
next to the Msamp/s front-end kernels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream


def _compact(values, keep, capacity=None):
    """Pack values[keep] to the front (zeros after); (out[cap], count).

    Scatter-add formulation: kept element j goes to slot
    ``cumsum(keep)[j]-1``; dropped elements park at the last slot with a
    zero contribution.
    """
    n = values.shape[0]
    cap = capacity or n
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, jnp.clip(pos, 0, cap - 1), cap - 1)
    contrib = jnp.where(keep, values, jnp.zeros((), values.dtype))
    out = jnp.zeros((cap,), values.dtype).at[slot].add(contrib)
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), cap)
    return out, count


# ---------------------------------------------------------------------------
# Manchester decoder
# ---------------------------------------------------------------------------

class ManchesterDecode(Block):
    """Manchester decoder with violation-windowed resync
    (/root/reference/lib/baz_manchester_decode_bb.cc:72-80 and its
    general_work loop).

    Input: bit-bytes (0/1). Pairs (first, second) decode to
    ``first==0 && second==1`` (inverted when ``original=True``); equal
    pairs are coding violations. When ``threshold`` violations accrue in
    a sliding ``window`` of pairs, the decoder slips its pair alignment
    by one sample (the reference's rewind) and clears the window.
    Output: decoded bit-bytes, ~half rate, masked count.
    """

    def __init__(self, original: bool = False, window: int = 16,
                 threshold: int = 8, name=None):
        super().__init__(name)
        if window > 31:
            raise ValueError("violation window limited to 31 pairs")
        self.original = bool(original)
        self.window = int(window)
        self.threshold = int(threshold)

    def init_state(self):
        return dict(phase=np.int32(0),        # 0: next sample starts a pair
                    prev=np.int32(0),          # held first-of-pair sample
                    viol_hist=np.uint32(0),    # window bitmask
                    hist_len=np.int32(0))

    def apply(self, state, params, x: Stream):
        w, thr = self.window, self.threshold
        orig = self.original

        def step(s, xi):
            xi = (xi != 0).astype(jnp.int32)
            is_second = s["phase"] == 1
            first = s["prev"]
            violation = is_second & (first == xi)
            emit = is_second & (first != xi)
            bit = jnp.where(jnp.logical_xor(
                (first == 0) & (xi == 1), orig), 1, 0).astype(jnp.uint8)

            hist = jnp.where(
                is_second,
                ((s["viol_hist"] << 1) | violation.astype(jnp.uint32))
                & jnp.uint32((1 << w) - 1),
                s["viol_hist"])
            hlen = jnp.where(is_second,
                             jnp.minimum(s["hist_len"] + 1, w),
                             s["hist_len"])
            vcount = jax.lax.population_count(hist).astype(jnp.int32)
            slip = is_second & (hlen >= w) & (vcount >= thr)
            # slip: clear window and re-use this sample as first-of-pair
            new = dict(
                phase=jnp.where(slip, 1,
                                jnp.where(is_second, 0, 1)).astype(jnp.int32),
                prev=jnp.where(slip | ~is_second, xi, s["prev"]),
                viol_hist=jnp.where(slip, jnp.uint32(0), hist),
                hist_len=jnp.where(slip, 0, hlen))
            return new, (emit, bit)

        new_state, (emits, bits) = jax.lax.scan(
            step, state, x.data.astype(jnp.int32))
        valid_in = x.valid_mask()
        emits = emits & valid_in
        out, count = _compact(bits, emits, capacity=x.data.shape[0] // 2 + 1)
        return new_state, (Stream(
            data=out, count=count,
            meta=x.meta.with_rate(x.meta.sample_rate * 0.5)),)


# ---------------------------------------------------------------------------
# DPLL bit synchronizer
# ---------------------------------------------------------------------------

class DPLLBitSync(Block):
    """Pulse-train digital PLL (baz_dpll_bb,
    /root/reference/lib/baz_dpll_bb.cc work loop).

    Tracks the period of an incoming pulse train (bit-bytes, nonzero =
    pulse): on each pulse, the measured period updates the estimate
    through a gain-weighted EWMA, with ``relative_limit`` clamping and
    ``ignore_limit`` rejection — the reference's locked-mode behavior.
    Outputs: (pulses aligned to input, period estimate per sample) plus
    period-measurement events (diff, period) — the message-port feed
    consumed by rate_synchroniser (SURVEY.md §3.4).
    """

    n_out = 3
    MAX_EVENTS = 512

    def __init__(self, period: float, gain: float = 0.05,
                 relative_limit: float = 0.05, ignore_limit: float = 0.5,
                 name=None):
        super().__init__(name)
        self.period0 = float(period)
        self.gain = float(gain)
        self.rel = float(relative_limit)
        self.ign = float(ignore_limit)

    def init_state(self):
        return dict(period=np.float32(self.period0),
                    phase=np.float32(0.0),      # cycles since last pulse
                    count=np.int32(0),
                    last_idx=np.int32(-1),
                    global_idx=np.int32(0))

    def apply(self, state, params, x: Stream):
        g, rel, ign = self.gain, self.rel, self.ign

        def step(s, xi):
            pulse = xi != 0
            freq = 1.0 / s["period"]
            phase = s["phase"] + freq
            current_period = phase / freq  # samples since last pulse
            diff = current_period - s["period"]
            ratio = diff / s["period"]

            adjust = pulse & (s["count"] > 0) & (jnp.abs(ratio) < ign)
            clamped = jnp.clip(current_period,
                               s["period"] * (1.0 - rel),
                               s["period"] * (1.0 + rel))
            new_period = jnp.where(
                adjust, (1.0 - g) * s["period"] + g * clamped, s["period"])

            emit_ev = pulse & (s["last_idx"] >= 0)
            idx_diff = s["global_idx"] - s["last_idx"]

            new = dict(
                period=new_period,
                phase=jnp.where(pulse, 0.0, phase),
                count=jnp.where(pulse, s["count"] + 1, s["count"]),
                last_idx=jnp.where(pulse, s["global_idx"], s["last_idx"]),
                global_idx=s["global_idx"] + 1)
            return new, (pulse, new_period, emit_ev,
                         idx_diff.astype(jnp.float32), current_period)

        new_state, (pulses, periods, evs, diffs, cur_periods) = jax.lax.scan(
            step, state, x.data.astype(jnp.int32))
        n = x.data.shape[0]
        cap = self.MAX_EVENTS
        rows = jnp.stack([diffs, periods, cur_periods], axis=1)
        pos = jnp.cumsum(evs.astype(jnp.int32)) - 1
        slot = jnp.where(evs, jnp.clip(pos, 0, cap - 1), cap - 1)
        ev = jnp.zeros((cap, 3), jnp.float32).at[slot].add(
            jnp.where(evs[:, None], rows, 0.0))
        n_ev = jnp.minimum(jnp.sum(evs.astype(jnp.int32)), cap)
        return new_state, (
            x.like(pulses.astype(jnp.uint8), count=x.count),
            x.like(periods.astype(jnp.float32), count=x.count),
            Stream(data=ev, count=n_ev, meta=x.meta))


# ---------------------------------------------------------------------------
# ACARS decoder
# ---------------------------------------------------------------------------

ACARS_PREAMBLE = np.uint32(0x3FFE5C5C)  # air-interface encoded
ACARS_MAX_PACKET = 252


class ACARSDecoder(Block):
    """ACARS aviation telemetry decoder
    (/root/reference/lib/baz_acars_decoder.cc:71-75,145-280).

    Input: float bit metrics (>0 -> air bit 0, <0 -> air bit 1, the
    reference's hard slicing). FSM: 32-bit preamble correlator with a
    wrong-bit threshold, then differential decode, LSB-first byte
    assembly with odd-parity check, bit reversal & 0x7F, SOH/STX/ETX/DEL
    framing. Emits completed packets as rows of a fixed event buffer:
    ``packets[MAX_PKTS, 2 + ACARS_MAX_PACKET]`` float32 where row =
    [n_bytes, parity_error_count, byte0, byte1, ...].
    """

    MAX_PKTS = 4
    STX_INDEX = 1 + 1 + 7 + 1 + 2 + 1  # SOH+mode+addr7+ack+label2+dbi

    def __init__(self, preamble_threshold: int = 2, name=None):
        super().__init__(name)
        self.thr = int(preamble_threshold)

    def init_state(self):
        return dict(
            searching=np.bool_(True),
            shift=np.uint32(0),
            prev_bit=np.int32(0),
            cur_byte=np.int32(0),
            bit_count=np.int32(0),
            byte_count=np.int32(0),
            parity_errors=np.int32(0),
            etx_index=np.int32(-1),
            got_etx=np.bool_(False),
            pkt=np.zeros((ACARS_MAX_PACKET,), np.float32),
        )

    def apply(self, state, params, x: Stream):
        thr = self.thr

        def step(s, metric):
            bit = jnp.where(metric > 0.0, 0, 1).astype(jnp.uint32)

            # --- searching: preamble correlator ---
            shift = ((s["shift"] << 1) | bit)
            wrong = jax.lax.population_count(shift ^ ACARS_PREAMBLE)
            sync = s["searching"] & (wrong <= thr)

            # --- assembling: differential decode ---
            dec = jnp.where(bit == 1, 1 - s["prev_bit"], s["prev_bit"])
            assembling = ~s["searching"]
            cur = jnp.where(assembling, (s["cur_byte"] << 1) | dec,
                            s["cur_byte"])
            bit_count = jnp.where(assembling, s["bit_count"] + 1,
                                  s["bit_count"])
            byte_done = assembling & (bit_count == 8)

            ones = jax.lax.population_count(cur.astype(jnp.uint32))
            parity_bad = byte_done & ((ones % 2) == 0)
            # reverse 8 bits then mask to 7 (reference's reversal + &0x7F)
            rev = jnp.sum(((cur >> jnp.arange(8)) & 1)
                          * (1 << (7 - jnp.arange(8))), dtype=jnp.int32)
            byte_val = rev & 0x7F

            bc = s["byte_count"]
            pkt = jnp.where(
                byte_done,
                s["pkt"].at[jnp.clip(bc, 0, ACARS_MAX_PACKET - 1)].set(
                    byte_val.astype(jnp.float32)),
                s["pkt"])
            got_etx = s["got_etx"] | (byte_done & (bc > self.STX_INDEX)
                                      & (byte_val == 0x03))
            etx_index = jnp.where(
                (s["etx_index"] < 0) & byte_done & (bc > self.STX_INDEX)
                & (byte_val == 0x03), bc, s["etx_index"])
            got_del = byte_done & (s["etx_index"] > 0) \
                & (bc == s["etx_index"] + 1 + 2) & (byte_val == 0x7F)
            finish = byte_done & (got_del | (bc + 1 >= ACARS_MAX_PACKET))

            parity_errors = jnp.where(byte_done & parity_bad,
                                      s["parity_errors"] + 1,
                                      s["parity_errors"])
            new = dict(
                searching=jnp.where(sync, False,
                                    jnp.where(finish, True, s["searching"])),
                shift=shift,
                prev_bit=jnp.where(sync, 0, dec.astype(jnp.int32)),
                cur_byte=jnp.where(sync | byte_done, 0, cur),
                bit_count=jnp.where(sync | byte_done, 0, bit_count),
                byte_count=jnp.where(sync | finish, 0,
                                     jnp.where(byte_done, bc + 1, bc)),
                parity_errors=jnp.where(sync | finish, 0, parity_errors),
                etx_index=jnp.where(sync | finish, -1, etx_index),
                got_etx=jnp.where(sync | finish, False, got_etx),
                pkt=jnp.where(sync | finish, jnp.zeros_like(pkt), pkt),
            )
            emit_pkt = jnp.where(
                finish,
                jnp.concatenate([
                    jnp.stack([(bc + 1).astype(jnp.float32),
                               parity_errors.astype(jnp.float32)]), pkt]),
                jnp.zeros((2 + ACARS_MAX_PACKET,), jnp.float32))
            return new, (finish, emit_pkt)

        new_state, (finishes, pkts) = jax.lax.scan(
            step, state, x.data.astype(jnp.float32))
        cap = self.MAX_PKTS
        pos = jnp.cumsum(finishes.astype(jnp.int32)) - 1
        slot = jnp.where(finishes, jnp.clip(pos, 0, cap - 1), cap - 1)
        out = jnp.zeros((cap, 2 + ACARS_MAX_PACKET), jnp.float32)
        out = out.at[slot].add(jnp.where(finishes[:, None], pkts, 0.0))
        n_pk = jnp.minimum(jnp.sum(finishes.astype(jnp.int32)), cap)
        return new_state, (Stream(data=out, count=n_pk, meta=x.meta),)
