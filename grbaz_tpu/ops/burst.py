"""Burst / timing machinery: gate, burster, burst buffer, merge, timekeeper.

The reference's tag-driven burst system (SURVEY.md §3.3): ``rx_time``
tags track hardware time, ``baz_gate`` extracts threshold-triggered
bursts and stamps ``tx_sob``/``tx_time``/``tx_eob`` for timed retransmit,
``baz_burster`` assembles interval/trigger bursts, ``baz_merge``
schedules burst streams into a main timeline, ``baz_time_keeper`` tracks
absolute stream time.

Here, stream tags become *event arrays*: fixed-capacity ``[cap, fields]``
float32 rows with a validity count, travelling through the graph like
any other stream. Burst timing is computed from the exact 64-bit sample
counters in :class:`StreamMeta` (no tag scanning). Each event row
carries the burst's absolute start expressed as
``(abs_hi, abs_lo, length, ...)`` so a TX scheduler (the merge block or
a hardware frontend) can place it sample-exactly — the tx_time
machinery without PMT.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import (Stream, StreamMeta, bits_to_f32,
                                   decode_abs_index, f32_to_bits,
                                   limbs_add_i32)


def decode_abs_events(rows, count=None) -> np.ndarray:
    """Host-side decode of Gate/Burster event rows.

    Fields 0/1 are BITCAST uint32 limbs of the absolute start sample
    (exact for any stream length); fields 2+ are plain float32. Returns
    ``[n, F-1]`` float64 rows ``(abs_start, field2, ...)``.
    """
    rows = np.asarray(rows, np.float32)
    n = int(count) if count is not None else len(rows)
    rows = rows[:n]
    abs_idx = decode_abs_index(rows[:, 0], rows[:, 1]).astype(np.float64)
    return np.concatenate([abs_idx[:, None], rows[:, 2:].astype(np.float64)],
                          axis=1)


def _event_pack(emits, rows, cap):
    """Compact per-sample event rows [n, F] into [cap, F] + count.

    Selection by ``top_k`` over negated emit positions + a [cap]-row
    gather — NOT a full-length scatter: a [n]-row scatter-add runs
    element-at-a-time on TPU and measured ~10 ms for a 1M block (it was
    the entire cost of the block-parallel Gate). The gather preserves
    BITCAST integer payload fields (limb pairs) bit-exactly. Rows past
    ``cap`` are dropped; count is clamped.
    """
    n = emits.shape[0]
    k = min(cap, n)
    idx = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(emits, idx, jnp.int32(n))
    neg, sel = jax.lax.top_k(-keys, k)         # first k emit positions
    sel = jnp.where(-neg < n, sel, 0)
    valid = (-neg) < n
    out = jnp.where(valid[:, None], rows.astype(jnp.float32)[sel], 0.0)
    if k < cap:
        out = jnp.concatenate(
            [out, jnp.zeros((cap - k, rows.shape[1]), jnp.float32)])
    return out, jnp.minimum(jnp.sum(emits.astype(jnp.int32)), cap)


class TimeKeeper(Block):
    """Absolute stream-time tracker (baz_time_keeper,
    /root/reference/lib/baz_time_keeper.cc:79,118-155).

    The reference scans rx_time tags; here time is exact in StreamMeta.
    Outputs the input unchanged plus a per-block time report event
    [abs_hi, abs_lo, epoch_sec, epoch_frac, sample_rate] where the limb
    fields are BITCAST uint32 (exact; decode with stream.decode_u32 /
    decode_abs_index). ``offset`` param mirrors set-time corrections
    (seconds added to reports).
    """

    n_out = 2

    def __init__(self, name=None):
        super().__init__(name)

    def init_params(self):
        return dict(offset=np.float32(0.0))

    def apply(self, state, params, x: Stream):
        m = x.meta
        report = jnp.stack([
            bits_to_f32(m.abs_hi), bits_to_f32(m.abs_lo),
            m.epoch_sec.astype(jnp.float32) + params["offset"],
            m.epoch_frac, jnp.float32(m.sample_rate)])[None, :]
        return state, (x, Stream(report, jnp.int32(1), m))


class Gate(Block):
    """Threshold/byte-triggered burst gate (baz_gate,
    /root/reference/lib/baz_gate.cc:147-238 behaviorally).

    Inputs: (signal, trigger). A burst opens when trigger exceeds
    ``threshold`` (float mode) or is nonzero (byte mode), stays open
    while retriggered within ``trigger_length`` samples, and closes
    after. Outputs:
      0. gated signal (zeros outside bursts),
      1. burst events [cap, 4]: (start_abs_hi, start_abs_lo, length,
         trigger_peak) — start includes ``delay`` samples, the tx_time
         stamp for retransmission.

    Block-parallel since r5 (the per-sample ``lax.scan`` FSM measured
    0.10 Msamp/s on v5e — this block sits in the full-IQ-rate burst
    extraction path, SURVEY §3.3). The retriggerable gate is a
    running-max rule: a sample is in a burst iff the most recent
    trigger is less than ``trigger_length`` samples old — exact and
    capacity-free via ``lax.cummax`` + segmented reductions
    (ops/segments.py). The non-retriggerable variant jumps between
    trigger edges with a ``MAX_BURSTS``-step event-level scan (exact up
    to MAX_BURSTS bursts per block — the event output's capacity
    anyway). Both are property-tested against the per-sample serial
    mirror (``_apply_scan``) in tests/test_burst.py, including bursts
    spanning block boundaries (whose start stamps the scan version
    mis-based before r5).
    """

    n_in = 2
    n_out = 2
    MAX_BURSTS = 64

    def __init__(self, threshold: float = 0.0, trigger_length: int = 0,
                 delay_samples: int = 0, byte_trigger: bool = False,
                 retriggerable: bool = True, name=None):
        super().__init__(name)
        self.threshold0 = float(threshold)
        self.trigger_length = int(trigger_length)
        self.delay = int(delay_samples)
        self.byte_trigger = bool(byte_trigger)
        self.retriggerable = bool(retriggerable)

    def init_state(self):
        return dict(open_count=np.int32(0),     # samples left in burst
                    in_burst=np.bool_(False),
                    burst_start_rel=np.int32(0),  # vs block base (may be <0)
                    peak=np.float32(0.0))

    def init_params(self):
        return dict(threshold=np.float32(self.threshold0),
                    trigger_length=np.int32(max(self.trigger_length, 1)))

    def _fire(self, params, trig: Stream):
        if self.byte_trigger:
            return trig.data.astype(jnp.int32) != 0
        return trig.data.astype(jnp.float32) > params["threshold"]

    def apply(self, state, params, x: Stream, trig: Stream):
        from grbaz_tpu.ops.segments import (NO_POS, next_true_index,
                                            running_last_true,
                                            seg_prefix_max)
        fire = self._fire(params, trig)
        tl = params["trigger_length"]
        n = x.data.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        lvl = trig.data.astype(jnp.float32)
        neg_inf = jnp.float32(-np.inf)

        if self.retriggerable:
            # in_burst[i] <=> most recent fire at or before i is younger
            # than trigger_length; the carried open_count is a virtual
            # fire at rel index open_count - tl - 1
            seed_fire = state["open_count"] - tl - 1
            last_fire = running_last_true(fire, idx, seed_fire)
            in_burst = (idx - last_fire) < tl
            prev_ib = jnp.concatenate([state["in_burst"][None],
                                       in_burst[:-1]])
            opening = fire & ~prev_ib
            closing = prev_ib & ~in_burst
            # burst start: most recent opening (carried start when the
            # open burst began in an earlier block — may be negative)
            seed_start = jnp.where(state["in_burst"],
                                   state["burst_start_rel"],
                                   jnp.int32(NO_POS))
            starts = running_last_true(opening, idx, seed_start)
            # trigger peak over the burst's fire samples
            pref = seg_prefix_max(opening, jnp.where(fire, lvl, neg_inf))
            before_first = jnp.cumsum(opening.astype(jnp.int32)) == 0
            carry_pk = jnp.where(state["in_burst"], state["peak"], neg_inf)
            pref = jnp.where(before_first, jnp.maximum(pref, carry_pk), pref)
            peaks = jnp.concatenate([carry_pk[None], pref[:-1]])
            lengths = idx - starts
            gate_open = in_burst | prev_ib
            emits = closing
            ev_starts, ev_lens, ev_peaks = starts, lengths, peaks
            end_ib = in_burst[-1]
            new_oc = jnp.maximum(last_fire[-1] + tl - (n - 1), 0)
            end_start = starts[-1]
            end_peak = pref[-1]
        else:
            # fixed-length bursts; fires during a burst (and at its
            # closing sample) are swallowed. Event-level scan: jump
            # from each burst's close to the next fire after it.
            nf = next_true_index(fire, fill=n)
            oc0 = jnp.where(state["in_burst"], state["open_count"],
                            jnp.int32(0))
            carry_close = oc0 - 1          # closing sample of carried burst
            pos0 = jnp.where(state["in_burst"],
                             jnp.minimum(carry_close + 1, n), jnp.int32(0))

            def step(pos, _):
                o = nf[jnp.clip(pos, 0, n - 1)]
                o = jnp.where(pos >= n, n, o)
                return jnp.minimum(o + tl + 1, n), o

            _, opens = jax.lax.scan(step, pos0, None,
                                    length=self.MAX_BURSTS)
            valid = opens < n
            closes = opens + tl            # closing sample index
            span = (idx[None, :] >= opens[:, None]) \
                & (idx[None, :] < closes[:, None]) & valid[:, None]
            pk_rows = jnp.max(jnp.where(span & fire[None, :],
                                        lvl[None, :], neg_inf), axis=1)
            # burst-open mask via edge differencing
            delta = jnp.zeros((n + 1,), jnp.int32)
            delta = delta.at[jnp.where(valid, opens, n)].add(
                valid.astype(jnp.int32))
            delta = delta.at[jnp.clip(closes, 0, n)].add(
                -valid.astype(jnp.int32))
            in_new = jnp.cumsum(delta[:-1]) > 0
            in_carry = (idx <= carry_close - 1) & state["in_burst"]
            in_burst = in_new | in_carry
            prev_ib = jnp.concatenate([state["in_burst"][None],
                                       in_burst[:-1]])
            gate_open = in_burst | prev_ib
            # events: carried burst first, then the new bursts
            carry_fire_pk = jnp.max(
                jnp.where(fire & (idx <= carry_close - 1), lvl, neg_inf))
            carry_pk = jnp.maximum(
                jnp.where(state["in_burst"], state["peak"], neg_inf),
                carry_fire_pk)
            carry_emit = state["in_burst"] & (carry_close <= n - 1)
            emits = jnp.concatenate([carry_emit[None],
                                     valid & (closes <= n - 1)])
            ev_starts = jnp.concatenate([state["burst_start_rel"][None],
                                         opens])
            ev_lens = jnp.concatenate(
                [(carry_close - state["burst_start_rel"])[None],
                 jnp.broadcast_to(tl, (self.MAX_BURSTS,))])
            ev_peaks = jnp.concatenate([carry_pk[None], pk_rows])
            end_ib = in_burst[-1]
            last_open = jnp.max(jnp.where(valid, opens, NO_POS))
            open_is_new = last_open + tl >= n   # closing sample beyond block
            new_oc = jnp.where(
                open_is_new, last_open + tl - (n - 1),
                jnp.maximum(oc0 - n, 0))
            end_start = jnp.where(open_is_new, last_open,
                                  state["burst_start_rel"])
            end_peak = jnp.where(
                open_is_new,
                jnp.max(jnp.where((idx >= last_open) & fire, lvl, neg_inf)),
                carry_pk)

        y = jnp.where(gate_open, x.data, jnp.zeros((), x.data.dtype))

        # burst events: absolute start = meta.abs + start_rel + delay,
        # carried as exact uint32 limb pairs (bitcast into the f32 rows
        # — the reference keeps exact uhd time, lib/baz_gate.cc:147-153;
        # f32-converted indices quantize past 2^24 ~ 5 s at 3.2 Msamp/s)
        m = ev_starts.shape[0]
        lo, hi = limbs_add_i32(jnp.full((m,), x.meta.abs_lo, jnp.uint32),
                               jnp.full((m,), x.meta.abs_hi, jnp.uint32),
                               ev_starts + jnp.int32(self.delay))
        rows = jnp.stack([
            bits_to_f32(hi), bits_to_f32(lo),
            ev_lens.astype(jnp.float32),
            jnp.where(jnp.isfinite(ev_peaks), ev_peaks, 0.0)], axis=1)
        events, n_ev = _event_pack(emits, rows, self.MAX_BURSTS)
        new_state = dict(
            open_count=jnp.where(end_ib, new_oc, jnp.int32(0)),
            in_burst=end_ib,
            burst_start_rel=jnp.where(end_ib, end_start - n, jnp.int32(0)),
            peak=jnp.where(end_ib & jnp.isfinite(end_peak), end_peak,
                           jnp.float32(0.0)))
        return new_state, (x.like(y, count=x.count),
                           Stream(events, n_ev, x.meta))

    def _apply_scan(self, state, params, x: Stream, trig: Stream):
        """Per-sample serial mirror of the reference FSM — kept as the
        property-test oracle for ``apply`` (not a production path)."""
        fire = self._fire(params, trig)
        tl = params["trigger_length"]
        retrig = self.retriggerable

        def step(s, args):
            i, f, lvl = args
            opening = f & ~s["in_burst"]
            extend = f & s["in_burst"] & retrig
            oc = jnp.where(opening | extend, tl,
                           jnp.maximum(s["open_count"] - 1, 0))
            in_burst = oc > 0
            closing = s["in_burst"] & ~in_burst
            new = dict(
                open_count=oc,
                in_burst=in_burst,
                burst_start_rel=jnp.where(opening, i, s["burst_start_rel"]),
                peak=jnp.where(opening, lvl,
                               jnp.where(f, jnp.maximum(s["peak"], lvl),
                                         jnp.where(closing, 0.0, s["peak"]))))
            length = i - s["burst_start_rel"]
            return new, (in_burst | s["in_burst"], closing, length, s["peak"],
                         s["burst_start_rel"])

        n = x.data.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        lvl = trig.data.astype(jnp.float32)
        new_state, (gate_open, closings, lengths, peaks, starts) = \
            jax.lax.scan(step, state, (idx, fire, lvl))
        # re-base the carried start for the next block (start may lie in
        # an earlier block)
        new_state = dict(new_state,
                         burst_start_rel=jnp.where(
                             new_state["in_burst"],
                             new_state["burst_start_rel"] - n, jnp.int32(0)))
        y = jnp.where(gate_open, x.data, jnp.zeros((), x.data.dtype))
        lo, hi = limbs_add_i32(jnp.full((n,), x.meta.abs_lo, jnp.uint32),
                               jnp.full((n,), x.meta.abs_hi, jnp.uint32),
                               starts + jnp.int32(self.delay))
        rows = jnp.stack([
            bits_to_f32(hi), bits_to_f32(lo),
            lengths.astype(jnp.float32), peaks], axis=1)
        events, n_ev = _event_pack(closings, rows, self.MAX_BURSTS)
        return new_state, (x.like(y, count=x.count),
                           Stream(events, n_ev, x.meta))


class BurstTagger(Block):
    """Trigger marks -> (sob_marks, eob_marks) streams, ``length`` apart
    (baz_burst_tagger: maps a trigger tag to tx_sob/tx_eob pairs,
    /root/reference/lib/baz_burst_tagger_impl.cc:70-84)."""

    n_in = 1
    n_out = 2

    def __init__(self, length: int, name=None):
        super().__init__(name)
        self.length = int(length)

    def init_state(self):
        return dict(pending_eob=np.int32(-1))  # rel index into next block

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        marks = x.data.astype(jnp.int32) != 0
        sob = marks.astype(jnp.uint8)
        eob_pos = jnp.where(marks, jnp.arange(n, dtype=jnp.int32)
                            + self.length - 1, -1)
        eob = jnp.zeros((n,), jnp.uint8)
        in_range = (eob_pos >= 0) & (eob_pos < n)
        eob = eob.at[jnp.clip(eob_pos, 0, n - 1)].add(
            in_range.astype(jnp.uint8))
        # carry an eob that lands beyond this block
        pend = state["pending_eob"]
        eob = eob.at[jnp.clip(pend, 0, n - 1)].add(
            ((pend >= 0) & (pend < n)).astype(jnp.uint8))
        over = jnp.where(eob_pos >= n, eob_pos - n, -1)
        new_pend = jnp.max(over)  # at most one per block in practice
        return dict(pending_eob=new_pend), (
            x.like(sob, count=x.count), x.like(eob, count=x.count))


class BurstBuffer(Block):
    """Accumulate a trigger-delimited burst, emit it as one frame
    (baz_burst_buffer semantics: buffer a complete burst then emit it
    contiguously). Inputs (signal, sob_marks, eob_marks); output frames
    [MAX_BURSTS, max_len] with per-frame lengths.

    Block-parallel since r5: bursts are delimited by sob/eob edge
    positions, so instead of a per-sample scan the block jumps between
    edges with a MAX_BURSTS-step event-level scan (ops/segments.py
    ``next_true_index``) and extracts each frame as one
    ``dynamic_slice`` — exact up to MAX_BURSTS bursts per block (the
    frame output's capacity anyway), property-tested against the
    per-sample mirror (``_apply_scan``) in tests/test_burst.py
    including bursts spanning multiple block boundaries.
    """

    n_in = 3
    n_out = 2
    MAX_BURSTS = 16

    def __init__(self, max_len: int, dtype=jnp.complex64, name=None):
        super().__init__(name)
        self.max_len = int(max_len)
        self.dtype = dtype

    def init_state(self):
        return dict(buf=np.zeros((self.max_len,), self.dtype),
                    fill=np.int32(0), active=np.bool_(False))

    def apply(self, state, params, x: Stream, sob: Stream, eob: Stream):
        from grbaz_tpu.ops.segments import NO_POS, next_true_index
        ml = self.max_len
        cap = self.MAX_BURSTS
        n = x.data.shape[0]
        xd = x.data.astype(self.dtype)
        so = sob.data.astype(jnp.int32) != 0
        eo = eob.data.astype(jnp.int32) != 0
        next_sob = next_true_index(so, fill=n)
        next_eob = next_true_index(eo, fill=n)
        idx = jnp.arange(n, dtype=jnp.int32)

        # ---- burst carried in from previous blocks ----
        fc = jnp.where(state["active"], state["fill"], jnp.int32(0))
        # fill reaches max_len at sample ml-fc-1; eob also closes
        carry_close = jnp.minimum(next_eob[0], ml - fc - 1)
        carry_emit = state["active"] & (carry_close <= n - 1)
        # continue filling the carried buffer with this block's samples
        carry_buf = jax.lax.dynamic_update_slice(
            jnp.concatenate([state["buf"],
                             jnp.zeros((n,), self.dtype)]),
            xd, (fc,))[:ml]
        carry_len = jnp.minimum(fc + carry_close + 1, ml)

        # ---- new bursts: jump sob -> close -> next sob ----
        pos0 = jnp.where(state["active"],
                         jnp.where(carry_emit, carry_close + 1, n),
                         jnp.int32(0))

        def step(pos, _):
            o = next_sob[jnp.clip(pos, 0, n - 1)]
            o = jnp.where(pos >= n, n, o)
            c = next_eob[jnp.clip(o, 0, n - 1)]
            c = jnp.minimum(jnp.where(o >= n, n, c), o + ml - 1)
            return jnp.minimum(c + 1, n), (o, c)

        _, (opens, closes) = jax.lax.scan(step, pos0, None, length=cap)
        valid = opens < n
        new_emits = valid & (closes <= n - 1)
        new_lens = jnp.minimum(closes - opens + 1, ml)

        xpad = jnp.concatenate([xd, jnp.zeros((ml,), self.dtype)])
        new_frames = jax.vmap(
            lambda o: jax.lax.dynamic_slice(xpad, (o,), (ml,)))(
                jnp.clip(opens, 0, n - 1))

        # ---- pack: carried frame first, then new bursts, masked to
        # each frame's length ----
        emits = jnp.concatenate([carry_emit[None], new_emits])
        frames_all = jnp.concatenate([carry_buf[None], new_frames])
        lens_all = jnp.concatenate([carry_len[None], new_lens])
        jmask = jnp.arange(ml)[None, :] < lens_all[:, None]
        frames_all = jnp.where(jmask, frames_all,
                               jnp.zeros((), self.dtype))
        pos = jnp.cumsum(emits.astype(jnp.int32)) - 1
        slot = jnp.where(emits, jnp.clip(pos, 0, cap - 1), cap - 1)
        frames = jnp.zeros((cap, ml), self.dtype).at[slot].add(
            jnp.where(emits[:, None], frames_all, 0))
        lens = jnp.zeros((cap,), jnp.int32).at[slot].add(
            jnp.where(emits, lens_all, 0))
        n_b = jnp.minimum(jnp.sum(emits.astype(jnp.int32)), cap)

        # ---- carried state out ----
        carry_still = state["active"] & ~carry_emit
        last_open = jnp.max(jnp.where(valid, opens, NO_POS))
        last_close = jnp.max(jnp.where(valid, closes, NO_POS))
        new_still = valid.any() & (last_close > n - 1)
        nfill = jnp.where(carry_still, jnp.minimum(fc + n, ml),
                          jnp.where(new_still, n - last_open,
                                    jnp.int32(0)))
        nbuf = jnp.where(
            carry_still, carry_buf,
            jnp.where(new_still,
                      jax.lax.dynamic_slice(
                          xpad, (jnp.clip(last_open, 0, n - 1),), (ml,)),
                      jnp.zeros((ml,), self.dtype)))
        nbuf = jnp.where(jnp.arange(ml) < nfill, nbuf,
                         jnp.zeros((), self.dtype))
        new_state = dict(buf=nbuf, fill=nfill,
                         active=carry_still | new_still)
        return new_state, (Stream(frames, n_b, x.meta),
                           Stream(lens, n_b, x.meta))

    def _apply_scan(self, state, params, x: Stream, sob: Stream,
                    eob: Stream):
        """Per-sample serial mirror — the property-test oracle."""
        ml = self.max_len

        def step(s, args):
            xi, so, eo = args
            start = (so != 0) & ~s["active"]
            active = s["active"] | start
            fill = jnp.where(start, 0, s["fill"])
            buf = jnp.where(
                active,
                s["buf"].at[jnp.clip(fill, 0, ml - 1)].set(xi), s["buf"])
            fill = jnp.where(active, jnp.minimum(fill + 1, ml), fill)
            emit = active & ((eo != 0) | (fill >= ml))
            new = dict(buf=jnp.where(emit, jnp.zeros_like(buf), buf),
                       fill=jnp.where(emit, 0, fill),
                       active=active & ~emit)
            return new, (emit, buf, fill)

        new_state, (emits, bufs, fills) = jax.lax.scan(
            step, state, (x.data.astype(self.dtype),
                          sob.data.astype(jnp.int32),
                          eob.data.astype(jnp.int32)))
        cap = self.MAX_BURSTS
        pos = jnp.cumsum(emits.astype(jnp.int32)) - 1
        slot = jnp.where(emits, jnp.clip(pos, 0, cap - 1), cap - 1)
        jm = jnp.arange(ml)[None, :] < fills[:, None]
        bufs = jnp.where(jm, bufs, jnp.zeros((), self.dtype))
        frames = jnp.zeros((cap, ml), self.dtype).at[slot].add(
            jnp.where(emits[:, None], bufs, 0))
        lens = jnp.zeros((cap,), jnp.int32).at[slot].add(
            jnp.where(emits, fills, 0))
        n_b = jnp.minimum(jnp.sum(emits.astype(jnp.int32)), cap)
        return new_state, (Stream(frames, n_b, x.meta),
                           Stream(lens, n_b, x.meta))


class Merge(Block):
    """Schedule burst frames into the main sample timeline by absolute
    time (baz_merge, /root/reference/lib/baz_merge.cc:101,172: merges a
    main stream with burst streams, placing bursts at tx_time-style
    stamps).

    Inputs: (main, burst_frames [cap, L], burst_starts_lo [cap] — the
    low 32 bits of each burst's absolute start sample, as either a
    uint32/int32 stream or the BITCAST-f32 limb field of a Gate/Burster
    event row). Bursts whose span intersects the current block are added
    into it (adds, so overlapping bursts sum — drop-residual handling
    simplified to clipping at block edges; a burst spanning a boundary
    contributes to both blocks via its absolute placement).
    """

    n_in = 3
    n_out = 1

    def __init__(self, max_burst_len: int, name=None):
        super().__init__(name)
        self.max_burst_len = int(max_burst_len)

    def apply(self, state, params, main: Stream, bursts: Stream,
              starts: Stream):
        n = main.data.shape[0]
        base = main.meta.abs_lo  # low limb is exact for placement windows
        cap, L = bursts.data.shape
        if starts.data.dtype in (jnp.float32, np.float32):
            starts_u32 = f32_to_bits(starts.data)  # bitcast limb field
        else:
            starts_u32 = starts.data.astype(jnp.uint32)
        # relative start of each burst within this block (wrap-aware)
        rel = (starts_u32 - base).astype(jnp.int32)
        valid = (jnp.arange(cap) < bursts.count)[:, None]
        offs = rel[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        in_blk = (offs >= 0) & (offs < n) & valid
        flat_idx = jnp.clip(offs, 0, n - 1).reshape(-1)
        contrib = jnp.where(in_blk, bursts.data,
                            jnp.zeros((), bursts.data.dtype)).reshape(-1)
        y = main.data.at[flat_idx].add(contrib)
        return state, (main.like(y, count=main.count),)


class Sweep(Block):
    """Frequency-sweep ramp source (baz_sweep,
    /root/reference/lib/baz_sweep.cc:96-129): emits a float frequency
    ramp from current value toward ``target`` at ``rate`` Hz/s, then
    holds. Drives tuners / freq-xlating params. Params are retunable
    (the sweep() call)."""

    n_in = 1  # pacing input (any stream; only counts/rate are used)
    n_out = 1

    def __init__(self, start: float = 0.0, name=None):
        super().__init__(name)
        self.start0 = float(start)

    def init_state(self):
        return dict(current=np.float32(self.start0))

    def init_params(self):
        return dict(target=np.float32(self.start0), rate=np.float32(0.0))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        step = params["rate"] / jnp.float32(x.meta.sample_rate)
        k = jnp.arange(1, n + 1, dtype=jnp.float32)
        up = jnp.minimum(state["current"] + k * step, params["target"])
        down = jnp.maximum(state["current"] - k * step, params["target"])
        ramp = jnp.where(params["target"] >= state["current"], up, down)
        return dict(current=ramp[-1]), (x.like(ramp, count=x.count),)


class NonBlocker(Block):
    """Real-time decoupler (baz_non_blocker,
    /root/reference/lib/baz_non_blocker.cc:87-131): emits full blocks
    regardless of input validity, zero-filling the shortfall, so
    downstream real-time sinks never stall."""

    def apply(self, state, params, x: Stream):
        y = x.masked_data()
        return state, (Stream(y, jnp.int32(x.data.shape[0]), x.meta),)


def rx_time_of(s: Stream):
    """Host-side rx_time extraction (python/rx_time.py:47-68 analog).

    The reference block scans the stream for ``rx_time`` tags and stores
    (whole seconds, fractional seconds) for the host; here time is exact
    in StreamMeta, so this is a pure function of the stream: returns
    ``(whole_seconds, fractional_seconds)`` of the block's first sample.
    """
    m = s.meta
    abs_idx = (int(np.uint32(m.abs_hi)) << 32) | int(np.uint32(m.abs_lo))
    t = float(m.epoch_frac) + abs_idx / float(m.sample_rate)
    whole = int(m.epoch_sec) + int(t)
    return whole, t - int(t)


class BursterConfig:
    """kwargs-style burster config (baz_burster_config,
    /root/reference/lib/baz_burster_config.h:31-48; the SWIG layer
    injects a Python kwargs ctor, swig/baz_swig.i:706-713 — mirrored
    here directly).

    Flags with no meaning in this runtime are kept for API parity and
    noted: ``read_time_tag`` is always effectively true (time is exact
    in StreamMeta); ``use_host_time`` stamping is done by the host
    executor on event arrival (host clocks cannot exist inside a
    compiled program); ``output_messages``/``msgq`` map to feeding the
    event output into net/message_server.EventToMessage; ``drop_current``
    is a host-queue policy.
    """

    def __init__(self, sample_rate: int = 1, item_size: int = 8,
                 burst_length: int = 256, interval: float = 1.0,
                 sample_interval: bool = False, relative_time: bool = False,
                 drop_current: bool = False, use_host_time: bool = False,
                 read_time_tag: bool = False, output_messages: bool = False,
                 msgq=None, output_stream: bool = True,
                 trigger_on_tags: bool = False, use_tag_lengths: bool = False,
                 trigger_tags=(), length_tags=(), eob_tags=(),
                 max_bursts: int = 16):
        self.sample_rate = int(sample_rate)
        self.item_size = int(item_size)
        self.burst_length = int(burst_length)
        self.interval = float(interval)
        self.sample_interval = bool(sample_interval)
        self.relative_time = bool(relative_time)
        self.drop_current = bool(drop_current)
        self.use_host_time = bool(use_host_time)
        self.read_time_tag = bool(read_time_tag)
        self.output_messages = bool(output_messages)
        self.msgq = msgq
        self.output_stream = bool(output_stream)
        self.trigger_on_tags = bool(trigger_on_tags)
        self.use_tag_lengths = bool(use_tag_lengths)
        self.trigger_tags = list(trigger_tags)
        self.length_tags = list(length_tags)
        self.eob_tags = dict(eob_tags) if eob_tags else {}
        self.max_bursts = int(max_bursts)

    def interval_samples(self) -> int:
        if self.sample_interval:
            return max(int(self.interval), 1)
        return max(int(round(self.interval * self.sample_rate)), 1)


class Burster(Block):
    """Stream -> timed bursts (baz_burster,
    /root/reference/lib/baz_burster.h:83-120 burst_time arithmetic;
    config lib/baz_burster_config.h:31-48).

    Interval mode (default): a ``burst_length`` window is captured every
    ``interval`` (seconds or samples — config.sample_interval), on the
    absolute sample grid carried by StreamMeta, so bursts are placed
    sample-exactly across block boundaries (a burst_length-1 history
    carry covers windows opening in the previous block). Trigger mode
    (config.trigger_on_tags): a second input carries a Gate/
    NativeCallbackX event stream; each event row (rel_index, ..) opens a
    burst, with per-burst lengths from the event's length field when
    config.use_tag_lengths (masked against the static capacity).

    Outputs:
      0. burst frames ``[max_bursts, burst_length]`` (count = #bursts)
      1. burst events ``[max_bursts, 4]``: (start_abs_hi, start_abs_lo,
         length, interval_index) — the tx_time stamp rows, same
         convention as :class:`Gate`.
    """

    n_out = 2

    def __init__(self, config: BursterConfig, dtype=jnp.complex64,
                 name=None):
        super().__init__(name)
        self.config = config
        self.dtype = dtype
        self.n_in = 2 if config.trigger_on_tags else 1

    def init_state(self):
        L = self.config.burst_length
        return dict(hist=np.zeros((L,), self.dtype),
                    # first not-yet-emitted start, relative to block
                    # base; in [-L+1, inf)
                    next_start=np.int32(0))

    def init_params(self):
        return dict(interval=np.int32(self.config.interval_samples()))

    def apply(self, state, params, x: Stream, *trig):
        cfg = self.config
        L = cfg.burst_length
        cap = cfg.max_bursts
        n = x.capacity
        ext = jnp.concatenate([state["hist"], x.data.astype(self.dtype)])

        if cfg.trigger_on_tags:
            ev = trig[0]
            k = jnp.arange(cap, dtype=jnp.int32)
            starts = ev.data[:cap, 0].astype(jnp.int32)
            valid = (k < ev.count) & (starts + L <= n)
            if cfg.use_tag_lengths and ev.data.shape[1] > 2:
                lengths = jnp.clip(ev.data[:cap, 2].astype(jnp.int32), 0, L)
            else:
                lengths = jnp.full((cap,), L, jnp.int32)
            next_start = state["next_start"]  # unused in trigger mode
        else:
            I = params["interval"]
            ns = state["next_start"]
            k = jnp.arange(cap, dtype=jnp.int32)
            starts = ns + k * I
            valid = starts + L <= n
            lengths = jnp.full((cap,), L, jnp.int32)
            # advance past every start emitted this block, then re-base
            n_emit = jnp.maximum((n - L - ns) // I + 1, 0)
            next_start = ns + n_emit * I - n

        starts_c = jnp.clip(starts, -L, n)  # keep gathers in bounds

        def grab(s):
            return jax.lax.dynamic_slice(ext, (s + L,), (L,))

        frames = jax.vmap(grab)(starts_c)
        mask = (jnp.arange(L)[None, :] < lengths[:, None]) & valid[:, None]
        frames = jnp.where(mask, frames, jnp.zeros((), self.dtype))
        n_bursts = jnp.sum(valid.astype(jnp.int32))

        # exact absolute starts: signed rel offset (starts_c may be < 0
        # for a window opening in the previous block) into uint32 limbs
        lo, hi = limbs_add_i32(jnp.full((cap,), x.meta.abs_lo, jnp.uint32),
                               jnp.full((cap,), x.meta.abs_hi, jnp.uint32),
                               starts_c)
        rows = jnp.stack([
            bits_to_f32(hi), bits_to_f32(lo),
            lengths.astype(jnp.float32), k.astype(jnp.float32)], axis=1)
        rows = jnp.where(valid[:, None], rows, 0.0)
        new_state = dict(hist=ext[-L:], next_start=next_start)
        return new_state, (Stream(frames, n_bursts, x.meta),
                           Stream(rows, n_bursts, x.meta))
