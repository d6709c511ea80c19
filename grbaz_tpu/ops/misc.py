"""Misc stream blocks: interleaver, FasTrak decoder, test counter,
swap_ff, field tracker, block-status probe.

Completes the SURVEY.md §2.1 long tail:

* :class:`MatrixInterleaver` — baz_interleaver
  (/root/reference/lib/baz_interleaver.cc:81-108): accumulate
  ``vlen_out`` input rows of ``vlen_in``, read out the transpose as
  columns, optionally round-robin across multiple output ports.
* :class:`FastrakDecoder` — baz_fastrak_decoder
  (/root/reference/lib/baz_fastrak_decoder.cc:141-330): threshold sync,
  oversampled hard-bit sampling, 12-bit sync word 0xAAC, 16-bit type
  (PT_ID=1 -> 32-bit ID), CRC16-CCITT check (crc16_compute :99-111),
  last-ID tracking. Exact FSM as a lax.scan.
* :class:`TestCounter` — baz_test_counter_cc: validates a monotonic
  counter stream (drop/corruption testing for network links).
* :class:`SwapFF` — baz_swap_ff: swap float pairs, runtime-switchable.
* :class:`FieldTracker` — baz_field_tracker: 3-input (signal,
  even-corr, odd-corr) field synchronizer: tracks which correlator fired
  last and flags field parity.
* :class:`BlockStatus` — baz_block_status
  (/root/reference/lib/baz_block_status.cc:47-72): in-stream probe
  emitting a status report every N samples — the insertable
  observability tap.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream


class MatrixInterleaver(Block):
    """Frames [n, vlen_in] -> transposed frames [m, vlen_out].

    Accumulates ``vlen_out`` rows then emits ``vlen_in`` columns (each a
    vlen_out-vector). Requires n % vlen_out == 0 per call for the
    static-shape formulation (use frame-sized blocks upstream).
    """

    def __init__(self, vlen_in: int, vlen_out: int, dtype=jnp.complex64,
                 name=None):
        super().__init__(name)
        self.vlen_in = int(vlen_in)
        self.vlen_out = int(vlen_out)
        self.dtype = dtype

    def apply(self, state, params, x: Stream):
        n, vi = x.data.shape
        assert vi == self.vlen_in
        assert n % self.vlen_out == 0, \
            "rows per block must be a multiple of vlen_out"
        groups = x.data.reshape(-1, self.vlen_out, self.vlen_in)
        cols = jnp.swapaxes(groups, 1, 2).reshape(-1, self.vlen_out)
        n_out = (x.count // self.vlen_out) * self.vlen_in
        return state, (x.like(cols, count=n_out,
                              rate_scale=self.vlen_in / self.vlen_out),)


def _crc16_ccitt_update(crc, byte):
    """crc16_compute from the reference (:99-111), int32 arithmetic."""
    t = ((crc >> 8) ^ byte) & 0xFF
    t = t ^ (t >> 4)
    out = ((crc << 8) ^ (t << 12) ^ (t << 5) ^ t) & 0xFFFF
    return out


class FastrakDecoder(Block):
    """FasTrak toll-transponder decoder. Inputs (bit metric float,
    sync correlation float). Output: ID events [cap, 3] =
    (id_hi16, id_lo16, consecutive-repeat count) — the 32-bit ID is
    split so float32 event rows carry it exactly."""

    n_in = 2
    n_out = 1
    MAX_EVENTS = 32
    SYNC_WORD = 0xAAC
    PT_ID = 0x0001

    # states
    SEARCH, SYNC, TYPE, DECODE, CRC = 0, 1, 2, 3, 4

    def __init__(self, sync_threshold: float = 1.0, oversampling: int = 8,
                 name=None):
        super().__init__(name)
        self.thr0 = float(sync_threshold)
        self.os = int(oversampling)

    def init_state(self):
        return dict(state=np.int32(self.SEARCH), sub=np.int32(0),
                    bit_buf=np.uint32(0), bit_ctr=np.int32(0),
                    crc=np.int32(0), crc_buf=np.int32(0),
                    crc_bits=np.int32(0), compute_crc=np.bool_(False),
                    payload_len=np.int32(0),
                    id=np.uint32(0), last_id=np.uint32(0),
                    last_id_count=np.int32(0))

    def init_params(self):
        return dict(threshold=np.float32(self.thr0))

    def apply(self, state, params, x: Stream, sync: Stream):
        thr = params["threshold"]
        os_ = self.os

        def step(s, args):
            metric, sy = args
            bit = (metric >= 0.0).astype(jnp.uint32)
            searching = s["state"] == self.SEARCH
            fire = searching & (sy >= thr)

            # when not searching: honor sub-symbol counter
            sampling = ~searching & (s["sub"] == 0)
            sub = jnp.where(searching,
                            jnp.where(fire, 0, s["sub"]),
                            jnp.where(sampling, os_ - 1,
                                      jnp.maximum(s["sub"] - 1, 0)))
            # fire: this very sample is the first bit sample (ref --i)
            take = fire | sampling
            st = jnp.where(fire, self.SYNC, s["state"])
            bit_buf = jnp.where(fire, bit,
                                jnp.where(take, (s["bit_buf"] << 1) | bit,
                                          s["bit_buf"]))
            bit_ctr = jnp.where(fire, 1,
                                jnp.where(take, s["bit_ctr"] + 1,
                                          s["bit_ctr"]))
            sub = jnp.where(fire, os_ - 1, sub)

            # CRC accumulation (active from TYPE onward)
            cc = jnp.where(fire, False, s["compute_crc"])
            crc_buf = jnp.where(take & cc, ((s["crc_buf"] << 1)
                                            | bit.astype(jnp.int32)),
                                s["crc_buf"])
            crc_bits = jnp.where(take & cc, s["crc_bits"] + 1, s["crc_bits"])
            byte_done = take & cc & ((crc_bits % 8) == 0)
            crc = jnp.where(fire, 0,
                            jnp.where(byte_done,
                                      _crc16_ccitt_update(s["crc"],
                                                          crc_buf & 0xFF),
                                      s["crc"]))
            crc_buf = jnp.where(byte_done, 0, crc_buf)

            # SYNC completes at 12 bits
            sync_done = take & (st == self.SYNC) & (bit_ctr == 12)
            sync_ok = sync_done & (bit_buf == self.SYNC_WORD)
            st = jnp.where(sync_done,
                           jnp.where(sync_ok, self.TYPE, self.SEARCH), st)
            cc = jnp.where(sync_ok, True, cc)
            crc_bits = jnp.where(sync_ok, 0, crc_bits)
            reset_bits = sync_done

            # TYPE completes at 16 bits
            type_done = take & (st == self.TYPE) & (bit_ctr == 16) \
                & ~sync_done
            type_ok = type_done & (bit_buf == self.PT_ID)
            st = jnp.where(type_done,
                           jnp.where(type_ok, self.DECODE, self.SEARCH), st)
            payload_len = jnp.where(type_ok, 32, s["payload_len"])
            reset_bits = reset_bits | type_done

            # DECODE completes at payload_len bits
            dec_done = take & (st == self.DECODE) \
                & (bit_ctr == payload_len) & ~type_done & ~sync_done
            new_id = jnp.where(dec_done, bit_buf, s["id"])
            st = jnp.where(dec_done, self.CRC, st)
            reset_bits = reset_bits | dec_done

            # CRC completes at 16 bits; crc==0 means pass
            crc_done = take & (st == self.CRC) & (bit_ctr == 16) \
                & ~dec_done & ~type_done & ~sync_done
            crc_ok = crc_done & (crc == 0)
            emit = crc_ok
            same = new_id == s["last_id"]
            last_id_count = jnp.where(
                emit, jnp.where(same, s["last_id_count"] + 1, 1),
                s["last_id_count"])
            last_id = jnp.where(emit, new_id, s["last_id"])
            st = jnp.where(crc_done, self.SEARCH, st)
            reset_bits = reset_bits | crc_done

            bit_buf = jnp.where(reset_bits, jnp.uint32(0), bit_buf)
            bit_ctr = jnp.where(reset_bits, 0, bit_ctr)

            new = dict(state=st, sub=sub, bit_buf=bit_buf, bit_ctr=bit_ctr,
                       crc=crc, crc_buf=crc_buf, crc_bits=crc_bits,
                       compute_crc=cc, payload_len=payload_len,
                       id=new_id, last_id=last_id,
                       last_id_count=last_id_count)
            return new, (emit, (new_id >> 16).astype(jnp.float32),
                         (new_id & 0xFFFF).astype(jnp.float32),
                         last_id_count.astype(jnp.float32))

        new_state, (emits, id_hi, id_lo, counts) = jax.lax.scan(
            step, state, (x.data.astype(jnp.float32),
                          sync.data.astype(jnp.float32)))
        cap = self.MAX_EVENTS
        pos = jnp.cumsum(emits.astype(jnp.int32)) - 1
        slot = jnp.where(emits, jnp.clip(pos, 0, cap - 1), cap - 1)
        rows = jnp.stack([id_hi, id_lo, counts], axis=1)
        ev = jnp.zeros((cap, 3), jnp.float32).at[slot].add(
            jnp.where(emits[:, None], rows, 0.0))
        n_ev = jnp.minimum(jnp.sum(emits.astype(jnp.int32)), cap)
        return new_state, (Stream(ev, n_ev, x.meta),)


class TestCounter(Block):
    """Validates an incrementing counter stream (baz_test_counter_cc):
    counts discontinuities across block boundaries too. Output passes
    the stream through; stats live in state (errors, last value)."""

    __test__ = False  # not a pytest class

    def __init__(self, name=None):
        super().__init__(name)

    def init_state(self):
        return dict(last=np.float32(-1.0), errors=np.int32(0),
                    total=np.int32(0))

    def apply(self, state, params, x: Stream):
        v = x.data.real.astype(jnp.float32) if jnp.iscomplexobj(x.data) \
            else x.data.astype(jnp.float32)
        prev = jnp.concatenate([state["last"][None], v[:-1]])
        expect = prev + 1.0
        mask = x.valid_mask()
        first_ever = (state["last"] < 0) & \
            (jnp.arange(v.shape[0]) == 0)
        bad = (v != expect) & mask & ~first_ever
        errors = state["errors"] + jnp.sum(bad.astype(jnp.int32))
        idx = jnp.clip(x.count - 1, 0, v.shape[0] - 1)
        new = dict(last=jnp.where(x.count > 0, v[idx], state["last"]),
                   errors=errors, total=state["total"] + x.count)
        return new, (x,)


class SwapFF(Block):
    """Swap adjacent float pairs (baz_swap_ff), runtime-switchable."""

    def __init__(self, swap: bool = True, name=None):
        super().__init__(name)
        self.swap0 = bool(swap)

    def init_params(self):
        return dict(swap=np.bool_(self.swap0))

    def apply(self, state, params, x: Stream):
        pairs = x.data.reshape(-1, 2)
        swapped = pairs[:, ::-1].reshape(-1)
        y = jnp.where(params["swap"], swapped, x.data)
        return state, (x.like(y, count=x.count),)


class FieldTracker(Block):
    """3-input field synchronizer (baz_field_tracker,
    /root/reference/lib/baz_field_tracker.cc:77-78): passes the signal,
    outputs field parity (+1 after even-sync fired, -1 after odd-sync)."""

    n_in = 3
    n_out = 2

    def __init__(self, threshold: float = 0.5, name=None):
        super().__init__(name)
        self.thr0 = float(threshold)

    def init_state(self):
        return dict(parity=np.float32(0.0))

    def init_params(self):
        return dict(threshold=np.float32(self.thr0))

    def apply(self, state, params, sig: Stream, even: Stream, odd: Stream):
        t = params["threshold"]
        ev = (even.data.astype(jnp.float32) > t).astype(jnp.float32)
        od = (odd.data.astype(jnp.float32) > t).astype(jnp.float32)
        # latest-event hold: +1 for even, -1 for odd, carried across blocks
        mark = ev - od
        nz = mark != 0

        def combine(a, b):
            return jnp.where(b[1], b[0], a[0]), (a[1] | b[1])

        held, _ = jax.lax.associative_scan(combine, (mark, nz))
        parity = jnp.where(jnp.cumsum(nz.astype(jnp.int32)) > 0, held,
                           state["parity"])
        return dict(parity=parity[-1]), (sig, sig.like(parity,
                                                       count=sig.count))


class BlockStatus(Block):
    """In-stream observability probe (baz_block_status): passes data
    through and emits a status report event every ``interval`` samples:
    [total_samples_lo, blocks_seen, valid_in_block, flags]."""

    n_out = 2

    def __init__(self, interval: int = 1 << 20, name=None):
        super().__init__(name)
        self.interval = int(interval)

    def init_state(self):
        return dict(total=np.float32(0.0),
                    blocks=np.int32(0), since_report=np.int32(0))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        total = state["total"] + x.count.astype(jnp.float32)
        since = state["since_report"] + x.count
        fire = since >= self.interval
        report = jnp.stack([
            total.astype(jnp.float32),
            (state["blocks"] + 1).astype(jnp.float32),
            x.count.astype(jnp.float32),
            x.meta.flags.astype(jnp.float32)])[None, :]
        new = dict(total=total, blocks=state["blocks"] + 1,
                   since_report=jnp.where(fire, 0, since))
        return new, (x, Stream(report, jnp.where(fire, 1, 0).astype(jnp.int32),
                               x.meta))
