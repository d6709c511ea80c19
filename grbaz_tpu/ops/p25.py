"""APCO P25 Phase-1 frame synchronization and NID extraction.

The reference wraps the external op25 OOT decoder behind
``python/baz_op25.py`` (op25_decoder_simple/op25_decoder :76/:194 wire
FSK4 -> op25 framer/decoder). This framework supplies its own framing
layer: :class:`P25FrameSync` consumes the dibit stream from
:class:`~grbaz_tpu.ops.fsk4.FSK4Demod` and emits frame events carrying
the NID fields (NAC, DUID).

P25 CAI constants (public TIA-102 air interface):

* 48-bit frame sync word ``0x5575F5FF77FF`` = 24 dibits;
* NID: 64 bits after the FS — 12-bit NAC + 4-bit DUID protected by
  BCH(63,16) + 1 parity bit. The info bits lead (systematic code), so
  hard extraction reads NAC/DUID directly; the BCH parity is reported
  as a raw match count for link-quality purposes.

Detection is block-parallel: the dibit stream (with a carried 55-dibit
tail so syncs straddling block boundaries are found exactly once)
expands into 56-dibit sliding windows via static shifted slices; FS
correlation, NID extraction and event compaction are all vector math.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream, bits_to_f32

FRAME_SYNC = 0x5575F5FF77FF  # 48-bit C4FM frame sync
FS_DIBITS = np.array([(FRAME_SYNC >> (46 - 2 * i)) & 0x3 for i in range(24)],
                     np.uint8)
NID_DIBITS = 32          # 64 NID bits
SPAN = 24 + NID_DIBITS   # dibits covered by one detection window

DUID_NAMES = {
    0x0: "HDU", 0x3: "TDU", 0x5: "LDU1", 0x7: "TSBK", 0xA: "LDU2",
    0xC: "PDU", 0xF: "TDU_LC",
}


class P25FrameSync(Block):
    """dibits (uint8) -> frame events [sym_idx, nac, duid, fs_errors].

    ``max_errors`` dibit mismatches are tolerated in the 24-dibit sync
    correlation (the op25 framer tolerates a small number of sync
    symbol errors).
    """

    MAX_EVENTS = 64

    def __init__(self, max_errors: int = 1, name=None):
        super().__init__(name)
        self.max_errors = int(max_errors)

    def init_state(self):
        # int32 symbol counter: wraps after 2^31 dibits (~5 days of
        # continuous 4800-baud traffic per counter epoch)
        return dict(tail=np.zeros(SPAN - 1, np.uint8),
                    tail_len=np.int32(0),
                    global_sym=np.int32(0))

    def init_params(self):
        return dict(max_errors=np.int32(self.max_errors))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        dib = x.data.astype(jnp.uint8)
        # buffer convention: valid data is a contiguous region ending at
        # 55+count — the tail's valid dibits are its SUFFIX (tail_len of
        # them), so partial blocks stay contiguous with the carry.
        buf = jnp.concatenate([state["tail"], dib])      # [SPAN-1 + n]
        hist = SPAN - 1
        # detection positions p (window = buf[p : p+SPAN]): each block
        # covers starts [global-55, global-55+n) exactly once
        n_pos = n
        windows = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(buf, t, n_pos)
             for t in range(SPAN)], axis=1)              # [n_pos, SPAN]
        p = jnp.arange(n_pos)
        pos_valid = (p >= hist - state["tail_len"]) \
            & (p + SPAN <= hist + x.count)

        fs = jnp.asarray(FS_DIBITS)
        errors = jnp.sum((windows[:, :24] != fs[None, :]).astype(jnp.int32),
                         axis=1)
        hit = (errors <= params["max_errors"]) & pos_valid

        # NID fields from the 32 dibits after the sync
        nid = windows[:, 24:].astype(jnp.int32)          # [n_pos, 32]
        # 64 bits MSB-first; NAC = bits 0..11, DUID = bits 12..15
        w_nac = jnp.asarray([4 ** (5 - i) for i in range(6)], jnp.int32)
        nac = jnp.sum(nid[:, :6] * w_nac[None, :], axis=1)
        duid = nid[:, 6] * 4 + nid[:, 7]

        # absolute symbol index of the sync start: buf[i] holds global
        # dibit (global_sym - 55 + i)
        base = state["global_sym"] - hist
        sym_idx = base + jnp.arange(n_pos, dtype=jnp.int32)

        # compact events; sym_idx rides BITCAST (exact to the full int32
        # counter range — f32 conversion quantizes past 2^24 dibits,
        # ~1 h at 4800 baud; decode with stream.decode_i32)
        from grbaz_tpu.ops.burst import _event_pack
        rows = jnp.stack([bits_to_f32(sym_idx),
                          nac.astype(jnp.float32),
                          duid.astype(jnp.float32),
                          errors.astype(jnp.float32)], axis=1)
        cap = self.MAX_EVENTS
        ev, n_ev = _event_pack(hit, rows, cap)

        # carry: the 55 buffer positions preceding the valid end
        # (buf[count : count+55]) — valid data stays a suffix
        tail = jax.lax.dynamic_slice_in_dim(
            buf, jnp.clip(x.count, 0, n).astype(jnp.int32), SPAN - 1)
        tail_len = jnp.minimum(state["tail_len"] + x.count,
                               SPAN - 1).astype(jnp.int32)

        new_state = dict(tail=tail, tail_len=tail_len,
                         global_sym=state["global_sym"]
                         + x.count.astype(jnp.int32))
        events = Stream(data=ev, count=jnp.minimum(n_ev, cap), meta=x.meta)
        return new_state, (events,)


def make_frame(nac: int, duid: int, payload_dibits: int = 0,
               rng=None) -> np.ndarray:
    """Test helper: FS + NID (+ random payload) as a dibit array.

    The BCH parity region is filled with zeros (hard extraction only
    reads the systematic info bits).
    """
    bits = [(nac >> (11 - i)) & 1 for i in range(12)]
    bits += [(duid >> (3 - i)) & 1 for i in range(4)]
    bits += [0] * 48
    nid = np.array([bits[2 * i] * 2 + bits[2 * i + 1] for i in range(32)],
                   np.uint8)
    parts = [FS_DIBITS, nid]
    if payload_dibits:
        rng = rng or np.random.default_rng(0)
        parts.append(rng.integers(0, 4, payload_dibits).astype(np.uint8))
    return np.concatenate(parts)
