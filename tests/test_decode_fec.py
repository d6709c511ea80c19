"""Decoders and FEC: Manchester, ACARS, DPLL, scrambler, puncture, Viterbi, BER."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.decode import ACARSDecoder, DPLLBitSync, ManchesterDecode
from grbaz_tpu.ops.fec import (AdditiveScrambler, Depuncture, PNBERv,
                               Puncture, ViterbiDecoder, conv_encode,
                               lfsr_bits, viterbi_decode)


def run_stream(block, x, block_size):
    state, params = block.init_state(), block.init_params()
    outs = [[] for _ in range(block.n_out)]
    for i in range(0, len(x) - block_size + 1, block_size):
        s = Stream.full(jnp.asarray(x[i:i + block_size]))
        state, ys = block.apply(state, params, s)
        for j, y in enumerate(ys):
            outs[j].append((np.asarray(y.data), int(y.count)))
    return outs


def manchester_encode(bits):
    out = np.zeros(2 * len(bits), np.uint8)
    out[0::2] = 1 - bits  # bit 1 -> (0,1)
    out[1::2] = bits
    return out


def test_manchester_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 2048).astype(np.uint8)
    enc = manchester_encode(bits)
    dec = ManchesterDecode()
    outs = run_stream(dec, enc, 1024)
    got = np.concatenate([d[:c] for d, c in outs[0]])
    np.testing.assert_array_equal(got, bits[:len(got)])
    assert len(got) == len(bits)


def test_manchester_resync_after_slip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    enc = manchester_encode(bits)
    # drop one sample at position 1001 -> alignment slips
    enc_slipped = np.concatenate([enc[:1001], enc[1002:]])
    dec = ManchesterDecode(window=16, threshold=8)
    outs = run_stream(dec, enc_slipped, 1000)
    got = np.concatenate([d[:c] for d, c in outs[0]])
    # after resync the tail should decode cleanly: compare last 1000 bits
    tail_got = got[-1000:]
    # find where this tail aligns in the original bit stream
    ref = bits.astype(np.int64)
    best = max(
        np.mean(tail_got == bits[off:off + 1000])
        for off in range(len(bits) - 1000))
    assert best > 0.99


def test_scrambler_involution_and_pn():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 4096).astype(np.uint8)
    s1 = AdditiveScrambler(mask=0x8A, seed=0x7F, reg_len=7, count=0,
                           bits_per_byte=8)
    s2 = AdditiveScrambler(mask=0x8A, seed=0x7F, reg_len=7, count=0,
                           bits_per_byte=8)
    o1 = run_stream(s1, data, 1024)[0]
    scr = np.concatenate([d[:c] for d, c in o1])
    o2 = run_stream(s2, scr, 1024)[0]
    back = np.concatenate([d[:c] for d, c in o2])
    np.testing.assert_array_equal(back, data)
    assert not np.array_equal(scr, data)


def test_scrambler_reset_count():
    data = np.zeros(300, np.uint8)
    s = AdditiveScrambler(count=100, bits_per_byte=8)
    (o,) = run_stream(s, data, 300)
    scr = o[0][0]
    # with all-zero input, output IS the pattern; resets every 100 bytes
    np.testing.assert_array_equal(scr[:100], scr[100:200])
    np.testing.assert_array_equal(scr[:100], scr[200:300])


def test_puncture_depuncture_roundtrip():
    rng = np.random.default_rng(3)
    matrix = [1, 1, 0, 1]
    x = rng.standard_normal(4096).astype(np.float32)
    p = Puncture(matrix)
    outs = run_stream(p, x, 1024)
    kept = np.concatenate([d[:c] for d, c in outs[0]])
    assert len(kept) == 4096 * 3 // 4
    d = Depuncture(matrix)
    outs2 = run_stream(d, kept, 768)
    rest = np.concatenate([dd[:c] for dd, c in outs2[0]])
    # restored stream has zeros at punctured positions, data elsewhere
    ref = x.copy().reshape(-1, 4)
    ref[:, 2] = 0.0
    ref = ref.reshape(-1)
    np.testing.assert_allclose(rest[:len(ref)], ref[:len(rest)], atol=1e-6)


def test_viterbi_clean_channel():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    code = conv_encode(bits)  # [T,2] 0/1
    soft = (code.astype(np.float32) * 2 - 1)
    dec = np.asarray(viterbi_decode(jnp.asarray(soft)))
    # last few bits lack traceback depth; ignore tail
    np.testing.assert_array_equal(dec[:-10], bits[:-10])


def test_viterbi_corrects_errors():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 4000).astype(np.uint8)
    soft = conv_encode(bits).astype(np.float32) * 2 - 1
    soft += 0.6 * rng.standard_normal(soft.shape).astype(np.float32)
    hard_errs = np.mean((soft > 0) != (conv_encode(bits) > 0))
    dec = np.asarray(viterbi_decode(jnp.asarray(soft)))
    ber = np.mean(dec[:-10] != bits[:-10])
    assert hard_errs > 0.02          # channel is genuinely noisy
    assert ber < hard_errs / 10      # decoder does real work
    assert ber < 0.003


def test_viterbi_streaming_block_invariance():
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, 8192).astype(np.uint8)
    soft = (conv_encode(bits).astype(np.float32) * 2 - 1
            + 0.3 * rng.standard_normal((8192, 2)).astype(np.float32))
    v1 = ViterbiDecoder(overlap=128)
    outs = run_stream(v1, soft, 2048)
    got = np.concatenate([d[:c] for d, c in outs[0]])
    ber = np.mean(got[200:-10] != bits[200:len(got) - 10])
    assert ber < 0.01


def test_pn_ber_estimator():
    # PN sequence through a channel with known flip rate
    rng = np.random.default_rng(7)
    deg, mask = 7, 0x60  # x^7 + x^6 + 1 -> taps at bits 6,5
    # generate PN by the same recurrence the tester predicts
    reg = 0x5A & 0x7F
    n = 50000
    bits = np.zeros(n, np.uint8)
    for i in range(n):
        b = bin(reg & mask).count("1") % 2
        bits[i] = b
        reg = ((reg << 1) | b) & 0x7F
    flip = rng.random(n) < 0.01
    rx = bits ^ flip
    tester = PNBERv(degree=deg, mask=mask, alpha=3e-4)
    outs = run_stream(tester, rx, 10000)
    ber = outs[0][-1][0][-1]
    # each flip appears ~(weight+1)=3 times in a self-synced tester
    assert 0.01 < ber < 0.06, ber


def test_acars_decodes_packet():
    # Build an air-interface bit stream: prekey of 1s, preamble, then a
    # framed packet (SOH ... STX ... ETX crc crc DEL)
    def encode_air(bits_tx):
        """differential: air bit 1 = change, 0 = same (inverse of decoder)."""
        out = []
        prev = 0
        for b in bits_tx:
            out.append(1 if b != prev else 0)
            prev = b
        return out

    def byte_to_bits(byte, parity_odd=True):
        # decoder reverses bits and masks 0x7F: it assembles MSB-first
        # shifting left, then reverses -> transmit LSB-first with parity
        # bit last such that total ones is odd
        bits = [(byte >> i) & 1 for i in range(7)]
        ones = sum(bits)
        parity = 1 - (ones % 2)  # make odd
        return bits + [parity]

    payload = [0x01] + [0x20] * 12 + [0x02] + [0x41, 0x42, 0x43] + [0x03]
    # indices: SOH at 0, STX at 14 (> STX_INDEX 13? == 13+1) ...
    tx_bits = []
    for byte in payload:
        tx_bits += byte_to_bits(byte)
    # ETX at byte index len(payload)-1; then 2 CRC bytes + DEL
    for byte in (0x11, 0x22, 0x7F):
        tx_bits += byte_to_bits(byte)

    decoded_stream = [1] * 32  # bias toward sync pattern end
    # preamble: decoder matches shift register == 0x3FFE5C5C (air bits)
    pre = [int(c) for c in bin(0x3FFE5C5C)[2:].zfill(32)]
    air = pre + encode_air(tx_bits)
    # metrics: air bit 1 -> negative, 0 -> positive
    metrics = np.array([1.0 if b == 0 else -1.0 for b in air], np.float32)
    metrics = np.concatenate([np.ones(100, np.float32), metrics,
                              np.ones(300, np.float32)])
    dec = ACARSDecoder()
    state, params = dec.init_state(), dec.init_params()
    state, (pkts,) = dec.apply(state, params,
                               Stream.full(jnp.asarray(metrics)))
    n = int(pkts.count)
    assert n == 1, n
    row = np.asarray(pkts.data)[0]
    nbytes, perr = int(row[0]), int(row[1])
    data = row[2:2 + nbytes].astype(int)
    assert perr == 0
    assert data[0] == 0x01          # SOH
    assert 0x02 in data.tolist()    # STX
    assert 0x03 in data.tolist()    # ETX
    assert data[nbytes - 1] == 0x7F  # DEL terminated
    assert data[14] == 0x41 and data[15] == 0x42  # payload text


def test_dpll_tracks_period():
    # pulse train with true period 100.3 samples, initial estimate 97
    n = 20000
    pulses = np.zeros(n, np.uint8)
    pos = 0.0
    while pos < n:
        pulses[int(pos)] = 1
        pos += 100.3
    dpll = DPLLBitSync(period=97.0, gain=0.1)
    outs = run_stream(dpll, pulses, 5000)
    periods = np.concatenate([d[:c] for d, c in outs[1]])
    # after convergence the period estimate should approach 100.3
    assert abs(periods[-1] - 100.3) < 1.0, periods[-1]
    # events carry (diff, period, current_period)
    ev, nev = outs[2][-1]
    assert nev > 0
    assert abs(ev[0, 0] - 100.0) <= 1.0  # index diffs ~ 100
