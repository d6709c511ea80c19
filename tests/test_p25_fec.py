"""P25 FEC primitives: encode/corrupt/decode round-trips."""

import numpy as np
import pytest

from grbaz_tpu.ops.p25_fec import (golay23_decode, golay23_encode,
                                   hamming10_decode, hamming10_encode,
                                   hamming15_decode, hamming15_encode,
                                   lsd16_check, lsd16_encode, rs_decode,
                                   rs_encode)


def corrupt(code, positions):
    c = code.copy()
    for p in positions:
        c[p] ^= 1
    return c


@pytest.mark.parametrize("nerr", [0, 1, 2, 3])
def test_golay23_corrects(nerr):
    rng = np.random.default_rng(nerr)
    for _ in range(30):
        info = (rng.random(12) < 0.5).astype(np.uint8)
        cw = golay23_encode(info)
        assert len(cw) == 23
        pos = rng.choice(23, size=nerr, replace=False)
        got, n = golay23_decode(corrupt(cw, pos))
        assert n == nerr
        np.testing.assert_array_equal(got, info)


def test_golay23_distance():
    """Minimum distance 7: every pair of randomly drawn codewords
    differs in >= 7 bits."""
    rng = np.random.default_rng(0)
    cws = [golay23_encode((rng.random(12) < 0.5).astype(np.uint8))
           for _ in range(40)]
    for i in range(len(cws)):
        for j in range(i + 1, len(cws)):
            d = int(np.sum(cws[i] ^ cws[j]))
            assert d == 0 or d >= 7


@pytest.mark.parametrize("nerr", [0, 1])
def test_hamming15_corrects(nerr):
    rng = np.random.default_rng(nerr)
    for _ in range(30):
        info = (rng.random(11) < 0.5).astype(np.uint8)
        cw = hamming15_encode(info)
        pos = rng.choice(15, size=nerr, replace=False)
        got, n = hamming15_decode(corrupt(cw, pos))
        assert n == nerr
        np.testing.assert_array_equal(got, info)


@pytest.mark.parametrize("nerr", [0, 1])
def test_hamming10_corrects(nerr):
    rng = np.random.default_rng(10 + nerr)
    for _ in range(30):
        info = (rng.random(6) < 0.5).astype(np.uint8)
        cw = hamming10_encode(info)
        pos = rng.choice(10, size=nerr, replace=False)
        got, n = hamming10_decode(corrupt(cw, pos))
        assert n == nerr
        np.testing.assert_array_equal(got, info)


@pytest.mark.parametrize("k,nparity", [(12, 12), (16, 8)])
def test_rs_roundtrip_and_correction(k, nparity):
    """(24,12,13) corrects 6 hexbit errors; (24,16,9) corrects 4."""
    rng = np.random.default_rng(k)
    t = nparity // 2
    for trial in range(20):
        data = rng.integers(0, 64, size=k).astype(np.uint8)
        cw = rs_encode(data, nparity)
        assert len(cw) == 24
        np.testing.assert_array_equal(cw[:k], data)  # systematic
        nerr = int(rng.integers(0, t + 1))
        pos = rng.choice(24, size=nerr, replace=False)
        bad = cw.copy()
        for p in pos:
            bad[p] ^= int(rng.integers(1, 64))
        got, n = rs_decode(bad, nparity)
        assert n == nerr, f"trial {trial}: corrected {n} != {nerr}"
        np.testing.assert_array_equal(got, data)


def test_rs_detects_overload():
    rng = np.random.default_rng(99)
    data = rng.integers(0, 64, size=16).astype(np.uint8)
    cw = rs_encode(data, 8)
    bad = cw.copy()
    for p in rng.choice(24, size=7, replace=False):  # > t = 4 errors
        bad[p] ^= int(rng.integers(1, 64))
    got, n = rs_decode(bad, 8)
    # either flagged uncorrectable or (rarely) miscorrected into
    # another codeword — never silently "0 errors"
    assert n != 0


def test_lsd16():
    rng = np.random.default_rng(3)
    info = (rng.random(8) < 0.5).astype(np.uint8)
    cw = lsd16_encode(info)
    assert lsd16_check(cw)
    bad = cw.copy()
    bad[5] ^= 1
    assert not lsd16_check(bad)


def test_bch_nid():
    from grbaz_tpu.ops.p25_fec import (_BCH_NID_G, bch_6416_check,
                                       bch_6416_encode)
    # degree-47 generator derived from cyclotomic cosets
    assert _BCH_NID_G.bit_length() - 1 == 47
    rng = np.random.default_rng(7)
    info = (rng.random(16) < 0.5).astype(np.uint8)
    cw = bch_6416_encode(info)
    assert cw.shape == (64,)
    assert np.array_equal(cw[:16], info)  # systematic
    assert bch_6416_check(cw)
    # cyclic: shifts of the 63-bit word remain codewords
    for s in (1, 17, 44):
        assert bch_6416_check(np.concatenate([np.roll(cw[:63], s), [0]]))
    # any single-bit flip inside the 63-bit word is detected
    for p in (0, 15, 16, 62):
        bad = cw.copy()
        bad[p] ^= 1
        assert not bch_6416_check(bad)
    # designed distance: every single-info-bit codeword has weight >= 23
    for i in range(16):
        e = np.zeros(16, np.uint8)
        e[i] = 1
        assert int(bch_6416_encode(e)[:63].sum()) >= 23


def test_wire_ldu_nid_parity():
    """make_wire_ldu now emits a BCH-valid NID (advisor r4)."""
    from grbaz_tpu.models.p25_voice import make_wire_ldu
    from grbaz_tpu.ops.p25_fec import bch_6416_check
    from grbaz_tpu.ops.p25_ldu import FS_BITS, NID_BITS, strip_status
    rng = np.random.default_rng(11)
    voice = (rng.random((9, 88)) < 0.5).astype(np.uint8)
    dibits = make_wire_ldu(0x293, 0x5, voice)
    bits = np.stack([(dibits >> 1) & 1, dibits & 1], axis=1).reshape(-1)
    payload, _status = strip_status(bits.astype(np.uint8))
    nid = payload[FS_BITS:FS_BITS + NID_BITS]
    assert bch_6416_check(nid)
