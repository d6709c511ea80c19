"""Detectors: peak detector, sync correlator, radar pulse detector.

Behavioral equivalents of the reference detectors (SURVEY.md §2.1
"Detectors / decoders"):

* :class:`PeakDetector` — rise/fall peak FSM with min_diff, min_len,
  lockout, drop, alpha smoothing, look_ahead confirmation and optional
  threshold (/root/reference/lib/baz_peak_detector.cc:69-94 + FSM in
  general_work). Expressed as a ``lax.scan`` over samples with emissions
  scattered back to their peak positions.
* :class:`Correlator` — known-sync-sequence correlator
  (/root/reference/lib/baz_correlator.cc:106-200): sliding
  ``corr[n] = sum_l x[n+l]*conj(s[l])`` computed as a complex FIR
  (strided-window matmuls), per-window peak picking against a threshold,
  correlation-surface output of ``width`` bins + trigger stream.
* :class:`RadarDetector` — threshold/plateau pulse burst detector
  (/root/reference/lib/baz_radar_detector.cc general_work): scan FSM
  emitting per-burst reports (start index, length, max, sum) as an
  event list with a validity count — the functional version of its
  msgq reports.

The scans here are per-sample FSMs; they are intended for decimated /
post-detection rates (as in the reference apps). The heavy lifting
(correlation itself) is batched matmul work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream, bits_to_f32


# ---------------------------------------------------------------------------
# peak detector
# ---------------------------------------------------------------------------

class PeakDetector(Block):
    """Rise/fall peak detection FSM. Outputs (marks, idx_diff):
    ``marks`` is 1.0 at each detected peak position (0 elsewhere);
    ``idx_diff`` is the distance to the previous peak at mark positions
    (the reference's optional int output).

    Block-parallel since r5 for the ``lockout == 0, look_ahead == 0``
    family (the per-sample ``lax.scan`` FSM measured 0.08 Msamp/s on
    v5e; this block sits in the full-rate spectral config-3 path): a
    "rise" is a maximal run of ``cond = (x >= thr) & (x > ave*(1-drop))``
    samples, so the FSM decomposes into segment structure
    (ops/segments.py running maxima), a segmented prefix max with
    first-position tracking (the peak and its index), and vectorized
    qualification/emission at run ends — exact, capacity-free, and
    property-tested against the serial mirror (``_apply_scan``) in
    tests/test_detect.py. ``lockout > 0`` or ``look_ahead > 0`` couple
    emissions back into segment structure (a lockout window swallows or
    trims the next rise; look-ahead splits a run at stale-peak points),
    a genuinely sequential chain — those configs keep the per-sample
    scan, which in reference deployments runs on decimated trigger
    streams, not full-rate IQ.
    """

    n_out = 2

    def __init__(self, min_diff: float = 0.0, min_len: int = 1,
                 lockout: int = 0, drop: float = 0.0, alpha: float = 1.0,
                 look_ahead: int = 0, threshold: Optional[float] = None,
                 name=None):
        super().__init__(name)
        self.min_diff = float(min_diff)
        self.min_len = int(min_len)
        self.lockout = int(lockout)
        self.drop = float(drop)
        self.alpha = float(alpha)
        self.look_ahead = int(look_ahead)
        self.threshold = threshold

    def init_state(self):
        return dict(ave=np.float32(0.0), prev=np.float32(0.0),
                    rising=np.bool_(False), rise_count=np.int32(0),
                    first=np.float32(0.0), peak=np.float32(0.0),
                    peak_age=np.int32(0),       # samples since current peak
                    lockout_count=np.int32(1),
                    last_peak_global=np.int32(-1),
                    global_idx=np.int32(0))

    def init_params(self):
        thr = self.threshold
        return dict(threshold=np.float32(-np.inf if thr is None else thr))

    def apply(self, state, params, x: Stream):
        if self.lockout > 0 or self.look_ahead > 0:
            return self._apply_scan(state, params, x)
        from grbaz_tpu.ops.iir import onepole_scan
        from grbaz_tpu.ops.segments import (NO_POS, running_last_true,
                                            seg_prefix_max,
                                            seg_prefix_maxpos)
        md, ml = jnp.float32(self.min_diff), jnp.int32(self.min_len)
        drop, alpha = self.drop, self.alpha
        thr = params["threshold"]
        neg_inf = jnp.float32(-np.inf)

        # jnp-wrap: numpy-fed Streams (bench/host paths) would fail the
        # traced-index gather at first_arr below
        xf = jnp.asarray(x.data).astype(jnp.float32)
        n = xf.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        base = state["global_idx"]
        gidx = base + idx

        # smoothed average of the PREVIOUS sample (reference updates
        # d_ave from in[i-1] before examining in[i])
        xprev = jnp.concatenate([state["prev"][None], xf[:-1]])
        if alpha == 1.0:
            ave = xprev
        else:
            ave = onepole_scan(jnp.float32(alpha) * xprev,
                               1.0 - alpha, state["ave"])
        cond = (xf >= thr) & (xf > ave * (1.0 - drop))
        # the carried lockout prefix (init_state starts the stream with
        # one locked sample, matching the reference's d_lockout_count=1)
        cond = cond & (idx >= state["lockout_count"])

        prev_in = jnp.concatenate([state["rising"][None], cond[:-1]])
        start_e = cond & ~prev_in
        end_e = ~cond & prev_in

        # segment structure (global coords; carried rise began
        # rise_count samples before this block)
        seed_start = jnp.where(state["rising"],
                               base - state["rise_count"],
                               jnp.int32(NO_POS))
        seg_start = running_last_true(start_e, gidx, seed_start)
        in_carried = (jnp.cumsum(start_e.astype(jnp.int32)) == 0) \
            & state["rising"]
        # first value of each segment, gather-free (a [n]-element gather
        # runs element-at-a-time on TPU, ~7 ms/1M block): ride the value
        # as a bitcast payload on a segmented "pick the start element"
        # max scan
        from grbaz_tpu.core.stream import bits_to_f32, f32_to_bits
        _, first_bits = seg_prefix_maxpos(
            start_e, jnp.where(start_e, 1.0, 0.0),
            f32_to_bits(xf).astype(jnp.int32))
        first_arr = jnp.where(in_carried, state["first"],
                              bits_to_f32(first_bits.astype(jnp.uint32)))

        # segmented prefix max + first position of the max. An end
        # sample contributes -inf, so reading the prefix AT the end
        # sample equals the state before it — no shift needed.
        pv, pp = seg_prefix_maxpos(start_e,
                                   jnp.where(cond, xf, neg_inf), gidx)
        carried_pos = base - 1 - state["peak_age"]
        take_c = in_carried & (state["peak"] >= pv)
        pv = jnp.where(take_c, state["peak"], pv)
        pp = jnp.where(take_c, carried_pos, pp)
        rc_at = gidx - seg_start      # rise length at an end sample

        qual = (rc_at >= ml) & ((pv - first_arr) >= md)
        emits = end_e & qual

        # Scatter-free mark construction (a [n]-element scatter runs
        # element-at-a-time on TPU — measured ~10 ms/1M block): sample
        # i is marked iff it is the FINAL first-max of a segment whose
        # end edge emits —
        #   (a) running first-max at i:   pp[i] == gidx[i] (in-rise),
        #   (b) nothing strictly greater later in the segment
        #       (reverse blocked segmented suffix max),
        #   (c) the segment's end edge emits (emit bit propagated
        #       backward over the segment).
        from grbaz_tpu.ops.segments import _cummax_blocked
        last_in_seg = cond & ~jnp.concatenate([cond[1:],
                                               jnp.zeros((1,), bool)])
        rst_rev = last_in_seg[::-1]
        vals_seg = jnp.where(cond, xf, neg_inf)
        suf = seg_prefix_max(rst_rev, vals_seg[::-1])[::-1]
        later = jnp.concatenate([suf[1:], jnp.full((1,), -np.inf,
                                                   jnp.float32)])
        later = jnp.where(jnp.concatenate([cond[1:],
                                           jnp.zeros((1,), bool)]),
                          later, neg_inf)
        emit_on_last = jnp.concatenate([emits[1:],
                                        jnp.zeros((1,), bool)])
        eback = seg_prefix_max(
            rst_rev, emit_on_last[::-1].astype(jnp.int32))[::-1] > 0
        marks_b = cond & (pp == gidx) & (later <= xf) & eback

        # carried-segment emission whose peak lies in a PREVIOUS block:
        # mark sample 0 (the serial mirror clips the out-of-block
        # position to 0)
        carried_emit = emits & (pp < base)
        m0 = jnp.any(carried_emit)
        pos0 = jnp.max(jnp.where(carried_emit, pp, jnp.int32(NO_POS)))

        # previous-peak chain for idx_diff (marked positions are
        # monotone, so "last emitted peak before me" is a running max)
        seed_last = jnp.where(state["last_peak_global"] >= 0,
                              state["last_peak_global"], jnp.int32(NO_POS))
        seed_chain = jnp.maximum(seed_last,
                                 jnp.where(m0, pos0, jnp.int32(NO_POS)))
        incl = _cummax_blocked(jnp.where(marks_b, gidx, jnp.int32(NO_POS)),
                               jnp.int32(NO_POS))
        lastb = jnp.maximum(
            jnp.concatenate([jnp.full((1,), NO_POS, jnp.int32), incl[:-1]]),
            seed_chain)
        diffs = jnp.where(lastb > NO_POS, gidx - lastb, 0)
        diff0 = jnp.where(seed_last > NO_POS, pos0 - seed_last, 0)

        at0 = idx == 0
        marks = marks_b.astype(jnp.float32) \
            + jnp.where(at0 & m0, 1.0, 0.0)
        idx_out = jnp.where(marks_b, diffs, 0) \
            + jnp.where(at0 & m0, diff0, 0)

        rising_end = cond[-1]
        m_last = jnp.maximum(incl[-1], seed_chain)
        new_state = dict(
            ave=ave[-1],
            prev=xf[-1],
            rising=rising_end,
            rise_count=jnp.where(rising_end,
                                 gidx[-1] - seg_start[-1] + 1, 0),
            first=jnp.where(rising_end, first_arr[-1], 0.0),
            peak=jnp.where(rising_end, pv[-1], 0.0),
            peak_age=jnp.where(rising_end, gidx[-1] - pp[-1], 0),
            lockout_count=jnp.maximum(state["lockout_count"] - n, 0),
            last_peak_global=jnp.where(m_last > NO_POS, m_last,
                                       jnp.int32(-1)),
            global_idx=base + n)
        return new_state, (x.like(marks, count=x.count),
                           x.like(idx_out, count=x.count))

    def _apply_scan(self, state, params, x: Stream):
        """Per-sample serial mirror of the reference FSM — the
        production path for lockout/look-ahead configs and the
        property-test oracle for the block-parallel ``apply``."""
        md, ml, lo = self.min_diff, self.min_len, self.lockout
        drop, alpha, la = self.drop, self.alpha, self.look_ahead
        thr = params["threshold"]

        def step(s, xi):
            ave = alpha * s["prev"] + (1.0 - alpha) * s["ave"]
            in_lockout = s["lockout_count"] > 0
            lockout_count = jnp.maximum(s["lockout_count"] - 1, 0)

            cond_rise = (xi >= thr) & (xi > ave * (1.0 - drop))
            start = cond_rise & ~s["rising"]
            higher = cond_rise & s["rising"] & (xi > s["peak"])

            rising = jnp.where(in_lockout, s["rising"],
                               jnp.where(cond_rise, True, False))
            first = jnp.where(in_lockout, s["first"],
                              jnp.where(start, xi, s["first"]))
            peak = jnp.where(in_lockout, s["peak"],
                             jnp.where(start | higher, xi, s["peak"]))
            peak_age = jnp.where(
                in_lockout, s["peak_age"],
                jnp.where(start | higher, 0, s["peak_age"] + 1))
            rise_count = jnp.where(
                in_lockout, s["rise_count"],
                jnp.where(start, 1,
                          jnp.where(cond_rise, s["rise_count"] + 1,
                                    s["rise_count"])))
            # emit when the rise ends (or lookahead expires) and the rise
            # qualified
            ended = s["rising"] & (~cond_rise | ((la > 0) & (peak_age >= la)))
            qual = (rise_count >= ml) & ((peak - first) >= md)
            emit = ended & qual & ~in_lockout
            peak_pos = s["global_idx"] - peak_age  # position of the peak
            idx_diff = jnp.where(s["last_peak_global"] >= 0,
                                 peak_pos - s["last_peak_global"], 0)
            new = dict(
                ave=ave, prev=xi,
                rising=jnp.where(ended & ~in_lockout, False, rising),
                rise_count=jnp.where(ended, 0, rise_count),
                first=first, peak=peak, peak_age=peak_age,
                lockout_count=jnp.where(emit, jnp.int32(lo), lockout_count),
                last_peak_global=jnp.where(emit, peak_pos,
                                           s["last_peak_global"]),
                global_idx=s["global_idx"] + 1)
            return new, (emit, peak_pos, idx_diff)

        n = x.data.shape[0]
        base = state["global_idx"]
        new_state, (emits, poss, diffs) = jax.lax.scan(
            step, state, x.data.astype(jnp.float32))
        rel = jnp.clip(poss - base, 0, n - 1)
        marks = jnp.zeros((n,), jnp.float32).at[rel].add(
            jnp.where(emits, 1.0, 0.0))
        idx_out = jnp.zeros((n,), jnp.int32).at[rel].add(
            jnp.where(emits, diffs, 0))
        return new_state, (x.like(marks, count=x.count),
                           x.like(idx_out, count=x.count))


# ---------------------------------------------------------------------------
# sync-sequence correlator
# ---------------------------------------------------------------------------

class Correlator(Block):
    """Sliding correlation against a known complex sync sequence.

    Per window of ``window_length`` input samples: find the correlation-
    magnitude peak; if >= threshold emit a trigger and a ``width``-bin
    correlation surface centered at the peak. Outputs:
    (surface [n_windows, width] float32, trigger [n_windows] float32
    peak magnitude — 0 when below threshold).

    Alignment: the detector is causal — a sync sequence starting at
    input sample p produces its correlation peak at output index
    ``p + L-1 + width//2`` (filter latency plus the surface margin).
    """

    n_out = 2

    def __init__(self, sync, window_length: int, threshold: float,
                 width: int, name=None):
        super().__init__(name)
        self.sync = np.asarray(sync, np.complex64)
        self.L = len(self.sync)
        self.window_length = int(window_length)
        self.threshold0 = float(threshold)
        self.width = int(width)
        # reversed conj sync as FIR taps: corr[n] = sum x[n+l] conj(s[l])
        self.hist = self.L - 1 + self.width // 2

    def init_state(self):
        return dict(tail=np.zeros((self.hist,), np.complex64))

    def init_params(self):
        return dict(threshold=np.float32(self.threshold0))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        assert n % self.window_length == 0, \
            "block size must be a multiple of window_length"
        frame = jnp.concatenate([state["tail"], x.data])
        # corr[n] = sum_l frame[n + l] * conj(s[l]), n in [0, N + width/2)
        n_corr = n + self.width // 2
        if self.L >= 64:
            # long sync patterns: overlap-save FFT correlation — the
            # window-matrix form below materializes [n_corr, L]
            from grbaz_tpu.ops.fir import fft_fir_frame
            corr = fft_fir_frame(frame, np.conj(self.sync), decim=1)
        else:
            idx = jnp.arange(n_corr, dtype=jnp.int32)[:, None] \
                + jnp.arange(self.L, dtype=jnp.int32)[None, :]
            win = frame[idx]
            s_conj = jnp.conj(jnp.asarray(self.sync))
            corr = win @ s_conj
        mag = jnp.abs(corr).astype(jnp.float32)

        n_w = n // self.window_length
        wmag = mag[:n].reshape(n_w, self.window_length)
        pk = jnp.argmax(wmag, axis=1)
        pkv = jnp.take_along_axis(wmag, pk[:, None], axis=1)[:, 0]
        trig = jnp.where(pkv >= params["threshold"], pkv, 0.0)
        # surface: width bins centered at each window's peak
        centers = pk + jnp.arange(n_w, dtype=jnp.int32) * self.window_length
        off = jnp.arange(self.width, dtype=jnp.int32) - self.width // 2
        sidx = jnp.clip(centers[:, None] + off[None, :], 0, n_corr - 1)
        surface = mag[sidx]
        new_state = dict(tail=frame[-self.hist:])
        return new_state, (
            x.like(surface, count=jnp.int32(n_w),
                   rate_scale=1.0 / self.window_length),
            x.like(trig, count=jnp.int32(n_w),
                   rate_scale=1.0 / self.window_length))


# ---------------------------------------------------------------------------
# radar pulse detector
# ---------------------------------------------------------------------------

class RadarDetector(Block):
    """Pulse burst detector. Input: power stream (float). Emits per-burst
    reports (start_idx, length, max, sum) as an event array with count.

    Threshold is relative to ``base_level`` in dB; a burst ends when the
    sample falls below threshold; plateau tracking mirrors the
    reference's flat-top accumulation. Optional second input supplies a
    per-sample base level (the reference's lvl input).
    """

    n_out = 1
    MAX_EVENTS = 256

    def __init__(self, base_level: float = 0.0, threshold_db: float = 10.0,
                 pulse_plateau_db: float = 1.0, name=None):
        super().__init__(name)
        self.base0 = float(base_level)
        self.thr0 = 10.0 ** (float(threshold_db) / 10.0)
        self.plat0 = 10.0 ** (float(pulse_plateau_db) / 10.0)

    def init_state(self):
        return dict(in_burst=np.bool_(False), start=np.int32(0),
                    bsum=np.float32(0.0), bmax=np.float32(0.0),
                    global_idx=np.int32(0),
                    dropped=np.int32(0))   # events lost to list overflow

    def init_params(self):
        return dict(base_level=np.float32(self.base0),
                    threshold=np.float32(self.thr0))

    def apply(self, state, params, x: Stream):
        thr = params["base_level"] * params["threshold"]
        # Block-vectorized formulation (no per-sample lax.scan — the
        # scan form measured 0.125 Msamp/s on v5e, below single-channel
        # radar video rates): threshold edges -> running-max segment
        # starts -> segmented prefix sum/max (ops/segments.py).
        # Capacity-free since r5 (advisor r4 medium): per-burst values
        # and the carried open-burst state are exact for ANY number of
        # bursts per block — only the packed event LIST has a capacity,
        # whose overflow is now counted in state["dropped"] (the count
        # still clamps and only an overflowing block's final slot is
        # unreliable, _event_pack semantics). Per-burst sums accumulate
        # directly per segment (no block-wide cumsum differencing —
        # advisor r4 low on cancellation). Emission semantics identical
        # to the serial loop: a report fires at the first
        # below-threshold sample with (start_idx, length, max, sum)
        # accumulated over [start, end).
        from grbaz_tpu.ops.segments import (NO_POS, running_last_true,
                                            seg_prefix_max, seg_prefix_sum)
        xd = x.data.astype(jnp.float32)
        n = xd.shape[0]
        cap = self.MAX_EVENTS
        above = xd >= thr
        prev_above = jnp.concatenate([state["in_burst"][None], above[:-1]])
        starts_e = above & ~prev_above
        ends_e = ~above & prev_above
        idx = jnp.arange(n, dtype=jnp.int32)
        gidx = state["global_idx"] + idx

        seed = jnp.where(state["in_burst"], state["start"],
                         jnp.int32(NO_POS))
        seg_start = running_last_true(starts_e, gidx, seed)
        in_carried = (jnp.cumsum(starts_e.astype(jnp.int32)) == 0) \
            & state["in_burst"]
        carry_sum = jnp.where(in_carried, state["bsum"], 0.0)
        carry_max = jnp.where(in_carried, state["bmax"],
                              jnp.float32(-np.inf))
        # below-threshold samples contribute 0 / -inf, so the prefix AT
        # an end sample equals the burst's full accumulation
        ssum = seg_prefix_sum(starts_e, jnp.where(above, xd, 0.0)) \
            + carry_sum
        smax = jnp.maximum(
            seg_prefix_max(starts_e, jnp.where(above, xd,
                                               jnp.float32(-np.inf))),
            carry_max)

        emits = ends_e
        starts = seg_start
        lens = gidx - seg_start
        maxs = smax
        sums = ssum

        # carried state: open burst at block end (exact — no slot table)
        still_open = above[-1]
        n_emit = jnp.sum(emits.astype(jnp.int32))
        new_state = dict(
            in_burst=still_open,
            start=jnp.where(still_open, seg_start[-1], jnp.int32(0)),
            bsum=jnp.where(still_open, ssum[-1], jnp.float32(0.0)),
            bmax=jnp.where(still_open, smax[-1], jnp.float32(0.0)),
            global_idx=state["global_idx"] + jnp.int32(n),
            dropped=state["dropped"] + jnp.maximum(n_emit - cap, 0))
        # compact events to the front; the absolute start index rides
        # BITCAST int32 (exact — f32 conversion quantizes past 2^24,
        # ~5 s at 3.2 Msamp/s; decode with stream.decode_i32 or
        # RadarDetector.decode_events)
        from grbaz_tpu.ops.burst import _event_pack
        rows = jnp.stack([bits_to_f32(starts),
                          lens.astype(jnp.float32), maxs, sums], axis=1)
        ev, n_ev = _event_pack(emits, rows, self.MAX_EVENTS)
        events = Stream(data=ev, count=n_ev, meta=x.meta)
        return new_state, (events,)

    @staticmethod
    def decode_events(rows, count=None) -> np.ndarray:
        """Host-side decode: [n, 4] float64 (start_idx, len, max, sum)."""
        from grbaz_tpu.core.stream import decode_i32
        rows = np.asarray(rows, np.float32)
        n = int(count) if count is not None else len(rows)
        rows = rows[:n]
        out = rows.astype(np.float64)
        out[:, 0] = decode_i32(rows[:, 0]).astype(np.float64)
        return out
