"""P25 voice glue: LDU extraction + DES-OFB decryption round trip.

The reference glue (python/baz_op25.py:124-187) converts hex keys and
hands them to the op25 decoder; here the whole voice path is native:
FrameSync events -> LDU extraction -> keystream application. An
encrypted synthetic LDU must round-trip to known plaintext bits.
"""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.models.p25_voice import (ALGID_CLEAR, ALGID_DES_OFB,
                                        LDU_DIBITS, P25VoiceDecoder,
                                        StubVocoder, convert_key_string,
                                        make_ldu)
from grbaz_tpu.ops.p25 import P25FrameSync

KEY = 0x0123456789ABCDEF
KEY_STR = "0123456789abcdef"
MI = 0xDEADBEEF01020304
NAC = 0x293


def _run_framesync(dibits, block=512):
    sync = P25FrameSync(max_errors=0)
    st = sync.init_state()
    pr = sync.init_params()
    meta = StreamMeta.start(4800.0)
    events = []
    pad = (-len(dibits)) % block
    d = np.concatenate([dibits, np.zeros(pad, np.uint8)])
    for i in range(0, len(d), block):
        st, (ev,) = sync.apply(st, pr,
                               Stream(jnp.asarray(d[i:i + block]),
                                      jnp.int32(block), meta))
        events.append((d[i:i + block], np.asarray(ev.data),
                       int(ev.count)))
    return events


def test_encrypted_ldu_roundtrip():
    rng = np.random.default_rng(42)
    voice = rng.integers(0, 2, (9, 144)).astype(np.uint8)
    ldu = make_ldu(NAC, 0xA, voice, mi=MI, algid=ALGID_DES_OFB,
                   kid=0x12, key=KEY)
    assert len(ldu) == LDU_DIBITS
    # over-the-air bits differ from plaintext (actually encrypted)
    stream = np.concatenate([rng.integers(0, 4, 100).astype(np.uint8),
                             ldu, rng.integers(0, 4, 64).astype(np.uint8)])
    dec = P25VoiceDecoder(key=KEY_STR)
    frames = []
    for dib, ev, n in _run_framesync(stream):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    for i, f in enumerate(frames):
        assert f.nac == NAC and f.duid == 0xA and f.index == i
        assert f.decrypted and f.algid == ALGID_DES_OFB and f.kid == 0x12
        np.testing.assert_array_equal(f.bits, voice[i])


def test_key_map_selects_by_kid_and_wrong_key_fails():
    rng = np.random.default_rng(1)
    voice = rng.integers(0, 2, (9, 144)).astype(np.uint8)
    ldu = make_ldu(NAC, 0x5, voice, mi=MI, algid=ALGID_DES_OFB,
                   kid=0x77, key=KEY)
    stream = np.concatenate([np.zeros(40, np.uint8), ldu])

    dec = P25VoiceDecoder(key_map={0x77: KEY_STR, 0x10: "0000000000000000"})
    frames = []
    for dib, ev, n in _run_framesync(stream):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    np.testing.assert_array_equal(frames[0].bits, voice[0])

    wrong = P25VoiceDecoder(key="00000000deadbeef")
    frames = []
    for dib, ev, n in _run_framesync(stream):
        frames.extend(wrong.feed(dib, ev, n))
    assert frames and not np.array_equal(frames[0].bits, voice[0])


def test_clear_ldu_passthrough_and_vocoder_stub():
    rng = np.random.default_rng(2)
    voice = rng.integers(0, 2, (9, 144)).astype(np.uint8)
    ldu = make_ldu(NAC, 0x5, voice, algid=ALGID_CLEAR)
    dec = P25VoiceDecoder()  # no key needed
    frames = []
    for dib, ev, n in _run_framesync(np.concatenate(
            [np.zeros(16, np.uint8), ldu])):
        frames.extend(dec.feed(dib, ev, n))
    assert len(frames) == 9
    for i, f in enumerate(frames):
        assert not f.decrypted
        np.testing.assert_array_equal(f.bits, voice[i])
    audio = StubVocoder().decode(frames[0])
    assert audio.shape == (160,) and audio.dtype == np.float32


def test_key_string_conversion_parity():
    """baz_op25._convert_key_string rules (:161-187)."""
    assert convert_key_string(None) is None
    assert convert_key_string(123) is None        # non-string
    assert convert_key_string("") is None         # empty
    assert convert_key_string("abc") is None      # odd nibble count
    assert convert_key_string("zz") is None       # non-hex
    assert convert_key_string("0a1B") == [0x0A, 0x1B]
    dec = P25VoiceDecoder()
    assert not dec.set_key("abc")
    assert not dec.set_key_map({})
    assert not dec.set_key_map({1: "abc"})
    assert dec.set_key_map({1: "ff", 2: "abc"})   # valid entries kept
