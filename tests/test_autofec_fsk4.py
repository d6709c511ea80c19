"""auto_fec closed-loop search + FSK4 demod."""

import numpy as np
import jax.numpy as jnp
import pytest

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.models.auto_fec import AutoFEC, _ROTATIONS
from grbaz_tpu.ops.fec import conv_encode
from grbaz_tpu.ops.fsk4 import FSK4Demod


def make_qpsk_stream(bits, rotation=0, conjugate=False, noise=0.1, seed=0):
    """Encode bits rate-1/2, map code-bit pairs to a QPSK symbol, then
    corrupt with an unknown constellation transform."""
    rng = np.random.default_rng(seed)
    code = conv_encode(bits).astype(np.float32) * 2 - 1  # [N, 2] +-1
    sym = (code[:, 0] + 1j * code[:, 1]).astype(np.complex64)
    sym += noise * (rng.standard_normal(len(sym))
                    + 1j * rng.standard_normal(len(sym))).astype(np.complex64)
    if conjugate:
        sym = np.conj(sym)
    # channel applies the INVERSE of the fixing rotation
    sym = sym / _ROTATIONS[rotation]
    return sym.astype(np.complex64)


@pytest.mark.parametrize("rotation,conjugate", [(0, False), (2, False),
                                                (1, True), (3, True)])
def test_autofec_locks(rotation, conjugate):
    rng = np.random.default_rng(42)
    afec = AutoFEC(threshold=0.05, settle=2)
    locked_at = None
    for blk in range(40):
        bits = rng.integers(0, 2, 2048).astype(np.uint8)
        sym = make_qpsk_stream(bits, rotation, conjugate, seed=blk)
        out_bits, ber, locked = afec.feed(sym)
        if locked:
            locked_at = blk
            break
    assert locked_at is not None, \
        f"never locked (ber {afec.last_ber:.3f}, steps {afec.steps})"
    # once locked, decoding is essentially clean
    bits = rng.integers(0, 2, 2048).astype(np.uint8)
    sym = make_qpsk_stream(bits, rotation, conjugate, seed=99)
    out_bits, ber, locked = afec.feed(sym)
    assert locked and ber < 0.02
    # 180-degree ambiguity: complementing every code bit of this code
    # yields another valid codeword (all-ones input -> all-ones output for
    # polys 171/133), so lock may land on complemented data — the
    # reference has the same ambiguity (resolved downstream by sync).
    errs = min(np.mean(out_bits[16:-16] != bits[16:-16]),
               np.mean(out_bits[16:-16] != 1 - bits[16:-16]))
    assert errs < 0.01


def test_autofec_relocks_after_change():
    rng = np.random.default_rng(1)
    afec = AutoFEC(threshold=0.05, settle=1)
    for blk in range(20):
        bits = rng.integers(0, 2, 1024).astype(np.uint8)
        _, _, locked = afec.feed(make_qpsk_stream(bits, 0, False, seed=blk))
        if locked:
            break
    assert afec.locked
    # constellation jumps (e.g. PLL slip): must unlock and re-search
    for blk in range(40):
        bits = rng.integers(0, 2, 1024).astype(np.uint8)
        _, ber, locked = afec.feed(make_qpsk_stream(bits, 2, False,
                                                    seed=100 + blk))
        if locked and ber < 0.05:
            break
    assert afec.locked and afec.last_ber < 0.05


def c4fm_baseband(dibits, sps):
    """Ideal rectangular C4FM discriminator output at sps samples/symbol."""
    levels = {1: 3.0, 0: 1.0, 2: -1.0, 3: -3.0}
    sym = np.array([levels[int(d)] for d in dibits], np.float32)
    return np.repeat(sym, sps)


def test_fsk4_demod_recovers_dibits():
    rng = np.random.default_rng(3)
    dibits = rng.integers(0, 4, 2000).astype(np.uint8)
    sps = 10  # 48 kHz channel / 4800 baud
    x = c4fm_baseband(dibits, sps)
    x += 0.1 * rng.standard_normal(len(x)).astype(np.float32)
    demod = FSK4Demod(channel_rate=48000.0)
    state, params = demod.init_state(), demod.init_params()
    got = []
    bs = 4000
    for i in range(0, len(x) - bs + 1, bs):
        s = Stream.full(jnp.asarray(x[i:i + bs]))
        state, (d, soft) = demod.apply(state, params, s)
        got.append(np.asarray(d.data)[:int(d.count)])
    got = np.concatenate(got)
    # allow a constant symbol offset at start; compare the bulk
    n = min(len(got), len(dibits)) - 8
    best = 0.0
    for off in range(4):
        acc = np.mean(got[8:n] == dibits[8 + off:n + off])
        best = max(best, acc)
    assert best > 0.95, f"symbol accuracy {best:.3f}"
