"""P25 voice-frame extraction + DES-OFB decryption glue.

The reference's op25 glue (python/baz_op25.py:124-187) wires a frame
decoder to DES decryption via ``set_key`` / ``set_key_map`` (hex-string
keys, keyed by KID) and defers voice synthesis to the op25 OOT's IMBE
vocoder. This module supplies the same glue role natively:

    P25FrameSync events + dibit stream
        -> LDU voice-frame extraction (9 frames per LDU)
        -> DES-OFB keystream application (utils/des.py, FIPS-verified)
        -> VoiceFrame records (+ a stub vocoder hook)

Container layout: the op25 OOT (not present in the reference tree) owns
the exact TIA-102 interleave/FEC schedule, so this framework defines a
documented LDU payload layout carrying the same information fields —
ES (MI/ALGID/KID) + 9x144-bit voice codewords — produced by
:func:`make_ldu` and consumed by :class:`P25VoiceDecoder`. The crypto
path (DES-OFB keystream from the 64-bit MI, ALGID 0x81, KID key
selection) matches the P25 security services model; an encrypted LDU
round-trips to plaintext dibits in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from grbaz_tpu.core.stream import decode_i32
from grbaz_tpu.ops.p25 import FS_DIBITS, make_frame
from grbaz_tpu.utils.des import ofb_keystream

# P25 common ALGIDs (TIA-102.AACA): 0x80 = clear, 0x81 = DES-OFB
ALGID_CLEAR = 0x80
ALGID_DES_OFB = 0x81

DUID_LDU1 = 0x5
DUID_LDU2 = 0xA

HDR_DIBITS = 56          # FS (24) + NID (32), ops/p25.py layout
ES_MI_DIBITS = 32        # 64-bit message indicator
ES_ALGID_DIBITS = 4      # 8-bit algorithm id
ES_KID_DIBITS = 8        # 16-bit key id
ES_DIBITS = ES_MI_DIBITS + ES_ALGID_DIBITS + ES_KID_DIBITS
VOICE_FRAMES = 9         # voice codewords per LDU
VF_DIBITS = 72           # 144 bits per codeword
LDU_DIBITS = HDR_DIBITS + ES_DIBITS + VOICE_FRAMES * VF_DIBITS


def _dibits_to_int(dibits: np.ndarray) -> int:
    v = 0
    for d in np.asarray(dibits, np.int64):
        v = (v << 2) | int(d)
    return v


def _int_to_dibits(value: int, n_dibits: int) -> np.ndarray:
    out = np.zeros(n_dibits, np.uint8)
    for i in range(n_dibits - 1, -1, -1):
        out[i] = value & 3
        value >>= 2
    return out


def _bits_of(dibits: np.ndarray) -> np.ndarray:
    d = np.asarray(dibits, np.uint8)
    return np.stack([(d >> 1) & 1, d & 1], axis=1).reshape(-1)


def _dibits_of(bits: np.ndarray) -> np.ndarray:
    b = np.asarray(bits, np.uint8).reshape(-1, 2)
    return (b[:, 0] << 1 | b[:, 1]).astype(np.uint8)


def _keystream_bits(key: int, iv: int, n_bits: int) -> np.ndarray:
    ks = ofb_keystream(key, iv)
    out = np.zeros(n_bits, np.uint8)
    i = 0
    while i < n_bits:
        block = next(ks)
        for b in range(min(64, n_bits - i)):
            out[i + b] = (block >> (63 - b)) & 1
        i += 64
    return out


@dataclasses.dataclass
class VoiceFrame:
    """One extracted 144-bit voice codeword."""

    nac: int
    duid: int
    index: int               # 0..8 within the LDU
    bits: np.ndarray         # [144] uint8 (plaintext when decrypted)
    algid: int = ALGID_CLEAR
    kid: int = 0
    decrypted: bool = False  # True when a keystream was applied


class StubVocoder:
    """Placeholder for the IMBE vocoder the reference defers to the
    op25 OOT: emits one silent 20 ms audio frame (160 samples at 8 kHz)
    per voice codeword, scaled by the codeword energy so squelch-style
    consumers still see activity."""

    RATE = 8000
    SAMPLES = 160

    def decode(self, frame: VoiceFrame) -> np.ndarray:
        level = float(np.mean(frame.bits)) * 1e-3
        return np.full(self.SAMPLES, level, np.float32)


def convert_key_string(key, kid=None) -> Optional[List[int]]:
    """Hex key string -> byte list (baz_op25._convert_key_string parity:
    non-strings, empty strings, and odd-nibble strings are rejected)."""
    if key is None or not isinstance(key, str) or len(key) == 0:
        return None
    if len(key) % 2 == 1:
        return None
    try:
        return [int(key[2 * i: 2 * i + 2], 16) for i in range(len(key) // 2)]
    except ValueError:
        return None


def _key_int(key_bytes: List[int]) -> int:
    v = 0
    for b in key_bytes[-8:]:
        v = (v << 8) | (b & 0xFF)
    return v


class P25VoiceDecoder:
    """Streaming LDU voice extractor + decryptor.

    Feed it the FSK4 dibit stream and P25FrameSync event arrays block by
    block; it returns :class:`VoiceFrame` lists. Key management mirrors
    the reference glue: ``set_key`` (single working key) and
    ``set_key_map`` (KID-indexed), both hex strings.
    """

    def __init__(self, key: Optional[str] = None,
                 key_map: Optional[Dict[int, str]] = None):
        self._key: Optional[int] = None
        self._key_map: Dict[int, int] = {}
        self._buf = np.zeros(0, np.uint8)
        self._base = 0  # global dibit index of _buf[0]
        self._pending: List[tuple] = []  # (sym_idx, nac, duid) awaiting data
        if key is not None:
            self.set_key(key)
        if key_map:
            self.set_key_map(key_map)

    # -- key management (baz_op25.py:124-161 semantics) --------------------
    def set_key(self, key) -> bool:
        kb = convert_key_string(key)
        if kb is None:
            return False
        self._key = _key_int(kb)
        return True

    def set_key_map(self, key_map) -> bool:
        if not key_map:
            return False
        converted = {}
        for kid, key in key_map.items():
            kb = convert_key_string(key, kid)
            if kb is None:
                continue
            converted[int(kid)] = _key_int(kb)
        if not converted:
            return False
        self._key_map.update(converted)
        return True

    def _key_for(self, kid: int) -> Optional[int]:
        if kid in self._key_map:
            return self._key_map[kid]
        return self._key

    # -- streaming extraction ----------------------------------------------
    def feed(self, dibits: np.ndarray, events: np.ndarray,
             n_events: Optional[int] = None) -> List[VoiceFrame]:
        """Consume one block of dibits + its frame-sync events.

        ``events`` is the P25FrameSync output ([cap, 4] f32 rows with a
        bitcast int32 sym_idx in field 0); sym_idx counts dibits from
        stream start, matching this decoder's global indexing.
        """
        dibits = np.asarray(dibits, np.uint8)
        self._buf = np.concatenate([self._buf, dibits])
        ev = np.asarray(events, np.float32)
        n = int(n_events) if n_events is not None else len(ev)
        for row in ev[:n]:
            sym_idx = int(decode_i32(np.float32(row[0])))
            nac, duid = int(row[1]), int(row[2])
            if duid in (DUID_LDU1, DUID_LDU2):
                self._pending.append((sym_idx, nac, duid))
        out: List[VoiceFrame] = []
        still_pending = []
        for sym_idx, nac, duid in self._pending:
            start = sym_idx - self._base
            if start < 0:
                continue  # dropped out of the window: stale event
            if start + LDU_DIBITS > len(self._buf):
                still_pending.append((sym_idx, nac, duid))
                continue  # LDU tail not yet received
            frame = self._buf[start: start + LDU_DIBITS]
            out.extend(self._decode_ldu(frame, nac, duid))
        self._pending = still_pending
        # retain a trailing window able to hold one straddling LDU
        keep = LDU_DIBITS + 64
        if len(self._buf) > keep and not self._pending:
            drop = len(self._buf) - keep
            self._buf = self._buf[drop:]
            self._base += drop
        return out

    def _decode_ldu(self, frame: np.ndarray, nac: int,
                    duid: int) -> List[VoiceFrame]:
        p = HDR_DIBITS
        mi = _dibits_to_int(frame[p: p + ES_MI_DIBITS])
        p += ES_MI_DIBITS
        algid = _dibits_to_int(frame[p: p + ES_ALGID_DIBITS])
        p += ES_ALGID_DIBITS
        kid = _dibits_to_int(frame[p: p + ES_KID_DIBITS])
        p += ES_KID_DIBITS

        encrypted = algid == ALGID_DES_OFB
        key = self._key_for(kid) if encrypted else None
        ks = None
        if encrypted and key is not None:
            ks = _keystream_bits(key, mi, VOICE_FRAMES * VF_DIBITS * 2)
        frames = []
        for i in range(VOICE_FRAMES):
            vf = frame[p + i * VF_DIBITS: p + (i + 1) * VF_DIBITS]
            bits = _bits_of(vf)
            dec = False
            if ks is not None:
                bits = bits ^ ks[i * VF_DIBITS * 2: (i + 1) * VF_DIBITS * 2]
                dec = True
            frames.append(VoiceFrame(nac=nac, duid=duid, index=i, bits=bits,
                                     algid=algid if encrypted
                                     else ALGID_CLEAR,
                                     kid=kid, decrypted=dec))
        return frames


# ---------------------------------------------------------------------------
# TIA-102 wire-format LDUs (ops/p25_ldu.py): the standard's 1728-bit
# frame schedule — status symbols, Golay/Hamming-protected voice
# codewords, RS+Hamming LC/ES words — replacing the r3 container for
# over-the-air-shaped captures. The DES-OFB keystream applies to the
# 9x88 voice info bits (MI-seeded, ALGID 0x81), with the ES carried in
# LDU2's RS(24,16) word exactly as the standard lays it out.
# ---------------------------------------------------------------------------

WIRE_LDU_DIBITS = 864


def _dibits_from_bits(bits: np.ndarray) -> np.ndarray:
    b = np.asarray(bits, np.uint8).reshape(-1, 2)
    return (b[:, 0] << 1 | b[:, 1]).astype(np.uint8)


def make_wire_ldu(nac: int, duid: int, voice_info: np.ndarray, *,
                  mi: int = 0, algid: int = ALGID_CLEAR, kid: int = 0,
                  key: Optional[int] = None,
                  lc72: Optional[np.ndarray] = None,
                  lsd16: Optional[np.ndarray] = None) -> np.ndarray:
    """Build one wire-format LDU as an 864-dibit array.

    ``voice_info`` is [9, 88] plaintext info bits; with ALGID 0x81 and
    a key the voice payload is DES-OFB encrypted before the FEC
    encoders (keystream over the 792 info bits, seeded from ``mi``).
    """
    from grbaz_tpu.ops.p25_ldu import build_ldu
    voice_info = np.asarray(voice_info, np.uint8).reshape(9, 88)
    if algid == ALGID_DES_OFB:
        if key is None:
            raise ValueError("encrypted LDU needs a key")
        # DES IV = the first 64 of the 72 MI bits (TIA-102 security
        # services convention)
        ks = _keystream_bits(key, (mi >> 8) & ((1 << 64) - 1),
                             voice_info.size)
        voice_info = (voice_info.reshape(-1) ^ ks).reshape(9, 88)
    # NID with real (63,16) BCH parity (a conformant receiver checks it;
    # previously the parity region was zeroed). The remaining known
    # interop caveat is the intra-codeword interleave — see the
    # ops/p25_ldu.py module docstring.
    from grbaz_tpu.ops.p25_fec import bch_6416_encode
    info16 = np.array([(nac >> (11 - i)) & 1 for i in range(12)]
                      + [(duid >> (3 - i)) & 1 for i in range(4)], np.uint8)
    nid = bch_6416_encode(info16)
    frame_bits = build_ldu(duid, nid, voice_info, lc72=lc72, mi=mi,
                           algid=algid, kid=kid, lsd16=lsd16)
    return _dibits_from_bits(frame_bits)


class P25WireVoiceDecoder(P25VoiceDecoder):
    """Streaming decoder for TIA-102 wire-format LDUs.

    Same feed interface and key management as :class:`P25VoiceDecoder`
    (dibits + P25FrameSync events in, :class:`VoiceFrame`s out), but
    the frames on the wire are the standard's 864-dibit schedule —
    status symbols stripped, voice codewords FEC-decoded
    (Golay/Hamming + de-whitening), ES recovered through the
    RS(24,16)+Hamming(10,6) word. Emitted ``VoiceFrame.bits`` are the
    88 info bits per codeword.
    """

    def feed(self, dibits: np.ndarray, events: np.ndarray,
             n_events: Optional[int] = None) -> List[VoiceFrame]:
        dibits = np.asarray(dibits, np.uint8)
        self._buf = np.concatenate([self._buf, dibits])
        ev = np.asarray(events, np.float32)
        n = int(n_events) if n_events is not None else len(ev)
        for row in ev[:n]:
            sym_idx = int(decode_i32(np.float32(row[0])))
            nac, duid = int(row[1]), int(row[2])
            if duid in (DUID_LDU1, DUID_LDU2):
                self._pending.append((sym_idx, nac, duid))
        out: List[VoiceFrame] = []
        still = []
        for sym_idx, nac, duid in self._pending:
            start = sym_idx - self._base
            if start < 0:
                continue
            if start + WIRE_LDU_DIBITS > len(self._buf):
                still.append((sym_idx, nac, duid))
                continue
            frame = self._buf[start: start + WIRE_LDU_DIBITS]
            out.extend(self._decode_wire_ldu(frame, nac, duid))
        self._pending = still
        keep = WIRE_LDU_DIBITS + 64
        if len(self._buf) > keep and not self._pending:
            drop = len(self._buf) - keep
            self._buf = self._buf[drop:]
            self._base += drop
        return out

    def _decode_wire_ldu(self, frame_dibits: np.ndarray, nac: int,
                         duid: int) -> List[VoiceFrame]:
        from grbaz_tpu.ops.p25_ldu import parse_ldu
        bits = _bits_of(frame_dibits)
        fields = parse_ldu(bits, duid)
        algid, kid, mi = ALGID_CLEAR, 0, 0
        if duid == DUID_LDU2 and fields.mi is not None:
            mi, algid, kid = fields.mi, fields.algid, fields.kid
        encrypted = algid == ALGID_DES_OFB
        key = self._key_for(kid) if encrypted else None
        voice = fields.voice.reshape(-1)
        dec = False
        if encrypted and key is not None:
            ks = _keystream_bits(key, (mi >> 8) & ((1 << 64) - 1),
                                 voice.size)
            voice = voice ^ ks
            dec = True
        voice = voice.reshape(9, 88)
        return [VoiceFrame(nac=nac, duid=duid, index=i, bits=voice[i],
                           algid=algid if encrypted else ALGID_CLEAR,
                           kid=kid, decrypted=dec)
                for i in range(9)]


def make_ldu(nac: int, duid: int, voice_bits: np.ndarray, *,
             mi: int = 0, algid: int = ALGID_CLEAR, kid: int = 0,
             key: Optional[int] = None, rng=None) -> np.ndarray:
    """TX/test helper: build one LDU dibit frame.

    ``voice_bits`` is [9, 144] plaintext; with ``algid == ALGID_DES_OFB``
    and a ``key`` the voice payload is encrypted with the DES-OFB
    keystream derived from ``mi`` (the over-the-air form).
    """
    voice_bits = np.asarray(voice_bits, np.uint8).reshape(
        VOICE_FRAMES, VF_DIBITS * 2)
    payload = [
        _int_to_dibits(mi, ES_MI_DIBITS),
        _int_to_dibits(algid, ES_ALGID_DIBITS),
        _int_to_dibits(kid, ES_KID_DIBITS),
    ]
    bits = voice_bits.reshape(-1)
    if algid == ALGID_DES_OFB:
        if key is None:
            raise ValueError("encrypted LDU needs a key")
        bits = bits ^ _keystream_bits(key, mi, bits.size)
    payload.append(_dibits_of(bits))
    payload_d = np.concatenate(payload)
    header = make_frame(nac, duid, payload_dibits=0, rng=rng)[:HDR_DIBITS]
    return np.concatenate([header, payload_d]).astype(np.uint8)
