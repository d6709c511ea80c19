"""TIA-102 wire-format LDU voice path: FrameSync -> FEC decode ->
DES-OFB decryption, end to end over a synthesized dibit stream."""

import numpy as np

from grbaz_tpu.models.p25_voice import (ALGID_CLEAR, ALGID_DES_OFB,
                                        WIRE_LDU_DIBITS,
                                        P25WireVoiceDecoder,
                                        make_wire_ldu)
from tests.test_p25_voice import KEY, KEY_STR, NAC, _run_framesync

MI = 0xDE_ADBEEF01020304AB  # 72-bit wire MI


def _stream_with(ldu, rng):
    return np.concatenate([rng.integers(0, 4, 101).astype(np.uint8),
                           ldu, rng.integers(0, 4, 64).astype(np.uint8)])


def test_encrypted_wire_ldu_roundtrip():
    rng = np.random.default_rng(7)
    voice = rng.integers(0, 2, (9, 88)).astype(np.uint8)
    ldu = make_wire_ldu(NAC, 0xA, voice, mi=MI, algid=ALGID_DES_OFB,
                        kid=0x12, key=KEY)
    assert len(ldu) == WIRE_LDU_DIBITS == 864
    dec = P25WireVoiceDecoder(key=KEY_STR)
    frames = []
    for dib, ev, n in _run_framesync(_stream_with(ldu, rng)):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    for i, f in enumerate(frames):
        assert f.nac == NAC and f.duid == 0xA and f.index == i
        assert f.decrypted and f.algid == ALGID_DES_OFB and f.kid == 0x12
        np.testing.assert_array_equal(f.bits, voice[i])


def test_wrong_key_garbles():
    rng = np.random.default_rng(8)
    voice = rng.integers(0, 2, (9, 88)).astype(np.uint8)
    ldu = make_wire_ldu(NAC, 0xA, voice, mi=MI, algid=ALGID_DES_OFB,
                        kid=0x12, key=KEY)
    dec = P25WireVoiceDecoder(key="00000000000000ff")
    frames = []
    for dib, ev, n in _run_framesync(_stream_with(ldu, rng)):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    mismatches = sum(int(np.any(f.bits != voice[i]))
                     for i, f in enumerate(frames))
    assert mismatches == 9


def test_wire_ldu_survives_channel_errors():
    """Sparse channel bit errors inside voice codewords are corrected
    by the Golay/Hamming layer before decryption."""
    rng = np.random.default_rng(9)
    voice = rng.integers(0, 2, (9, 88)).astype(np.uint8)
    ldu = make_wire_ldu(NAC, 0xA, voice, mi=MI, algid=ALGID_DES_OFB,
                        kid=0x12, key=KEY)
    bits = np.stack([(ldu >> 1) & 1, ldu & 1], axis=1).reshape(-1)
    # flip isolated bits inside the voice region (after FS+NID+VC1;
    # avoid the sync/NID area the FrameSync needs)
    for p in (300, 601, 907, 1203, 1499):
        bits[p] ^= 1
    ldu_bad = (bits.reshape(-1, 2)[:, 0] * 2
               + bits.reshape(-1, 2)[:, 1]).astype(np.uint8)
    dec = P25WireVoiceDecoder(key=KEY_STR)
    frames = []
    for dib, ev, n in _run_framesync(_stream_with(ldu_bad, rng)):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f.bits, voice[i])


def test_clear_wire_ldu1_with_lc():
    rng = np.random.default_rng(10)
    voice = rng.integers(0, 2, (9, 88)).astype(np.uint8)
    lc = rng.integers(0, 2, 72).astype(np.uint8)
    ldu = make_wire_ldu(NAC, 0x5, voice, algid=ALGID_CLEAR, lc72=lc)
    dec = P25WireVoiceDecoder()
    frames = []
    for dib, ev, n in _run_framesync(_stream_with(ldu, rng)):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    for i, f in enumerate(frames):
        assert f.duid == 0x5 and not f.decrypted
        np.testing.assert_array_equal(f.bits, voice[i])
