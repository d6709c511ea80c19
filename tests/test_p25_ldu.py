"""TIA-102 LDU wire framing: geometry, round-trips, FEC under noise."""

import numpy as np
import pytest

from grbaz_tpu.ops.p25_ldu import (DUID_LDU1, DUID_LDU2, LDU_BITS,
                                   LDU_DIBITS, N_STATUS, PAYLOAD_BITS,
                                   STATUS_EVERY, build_ldu, es_decode,
                                   es_encode, insert_status, lc_decode,
                                   lc_encode, parse_ldu, strip_status,
                                   vc_decode, vc_encode)


def test_geometry():
    """1728 = 1680 + 24 status dibits; 864 dibits; the standard's
    LDU arithmetic."""
    assert PAYLOAD_BITS == 1680
    assert N_STATUS == 24
    assert LDU_BITS == 1728
    assert LDU_DIBITS == 864
    assert PAYLOAD_BITS == 48 + 64 + 9 * 144 + 6 * 40 + 32


def test_status_symbol_positions():
    payload = np.arange(PAYLOAD_BITS, dtype=np.int64) % 2
    framed = insert_status(payload.astype(np.uint8), status=0b11)
    assert framed.size == LDU_BITS
    # a status dibit sits after every 70 payload bits
    for i in range(N_STATUS):
        base = i * (STATUS_EVERY + 2)
        assert framed[base + STATUS_EVERY] == 1
        assert framed[base + STATUS_EVERY + 1] == 1
    back, status = strip_status(framed)
    np.testing.assert_array_equal(back, payload.astype(np.uint8))
    assert all(s == 0b11 for s in status)


def test_voice_codeword_roundtrip_and_correction(rng):
    for _ in range(10):
        u = (rng.random(88) < 0.5).astype(np.uint8)
        cw = vc_encode(u)
        assert cw.size == 144
        got, n, ok = vc_decode(cw)
        assert ok and n == 0
        np.testing.assert_array_equal(got, u)
        # a 3-bit burst lands across interleaved codewords -> corrected
        bad = cw.copy()
        p = int(rng.integers(0, 141))
        bad[p:p + 3] ^= 1
        got, n, ok = vc_decode(bad)
        if ok:  # (burst may hit the unprotected u7 bits)
            np.testing.assert_array_equal(got[:81], u[:81])


def test_lc_word_roundtrip(rng):
    lc = (rng.random(72) < 0.5).astype(np.uint8)
    w = lc_encode(lc)
    assert w.size == 240
    got, ok = lc_decode(w)
    assert ok
    np.testing.assert_array_equal(got, lc)
    # hexbit errors within RS reach
    bad = w.copy()
    bad[13] ^= 1   # one bit in hexbit 1
    bad[205] ^= 1  # one bit in a parity hexbit
    got, ok = lc_decode(bad)
    assert ok
    np.testing.assert_array_equal(got, lc)


def test_es_word_roundtrip():
    mi, algid, kid = 0x1122334455667788 & ((1 << 72) - 1), 0x81, 0xBEEF
    w = es_encode(mi, algid, kid)
    got_mi, got_alg, got_kid, ok = es_decode(w)
    assert ok and got_mi == mi and got_alg == algid and got_kid == kid


@pytest.mark.parametrize("duid", [DUID_LDU1, DUID_LDU2])
def test_full_ldu_roundtrip(rng, duid):
    voice = (rng.random((9, 88)) < 0.5).astype(np.uint8)
    nid = (rng.random(64) < 0.5).astype(np.uint8)
    lc = (rng.random(72) < 0.5).astype(np.uint8)
    lsd = (rng.random(16) < 0.5).astype(np.uint8)
    frame = build_ldu(duid, nid, voice, lc72=lc, mi=0xABCDE, algid=0x81,
                      kid=0x1234, lsd16=lsd)
    assert frame.size == LDU_BITS
    out = parse_ldu(frame, duid)
    assert out.ok and out.corrected == 0
    np.testing.assert_array_equal(out.voice, voice)
    np.testing.assert_array_equal(out.nid_bits, nid)
    np.testing.assert_array_equal(out.lsd, lsd)
    if duid == DUID_LDU1:
        np.testing.assert_array_equal(out.lc, lc)
    else:
        assert (out.mi, out.algid, out.kid) == (0xABCDE, 0x81, 0x1234)


def test_ldu_under_bit_errors(rng):
    """Random sparse channel errors are corrected transparently."""
    voice = (rng.random((9, 88)) < 0.5).astype(np.uint8)
    nid = np.zeros(64, np.uint8)
    frame = build_ldu(DUID_LDU2, nid, voice, mi=42, algid=0x80, kid=7)
    bad = frame.copy()
    # ~0.3% BER: a handful of isolated errors, below every code's t
    for p in rng.choice(LDU_BITS, size=5, replace=False):
        bad[p] ^= 1
    out = parse_ldu(bad, DUID_LDU2)
    # voice + ES protected fields survive (hits on FS/NID/LSD/status
    # are outside this parser's FEC scope)
    np.testing.assert_array_equal(out.voice, voice)
    assert (out.mi, out.algid, out.kid) == (42, 0x80, 7)
    assert out.corrected >= 0
