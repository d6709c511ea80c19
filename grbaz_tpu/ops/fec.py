"""FEC kernels: LFSR scrambling, puncturing, BER estimation, Viterbi.

Covers the reference's FEC surface (SURVEY.md §2.1):
``baz_additive_scrambler_bb`` (LFSR additive scrambler with periodic
reset), ``baz_puncture_bb``/``baz_depuncture_ff`` (runtime matrix),
``baz_auto_ber_bf`` (online BER vs an LFSR reference — the reference
implementation is an unfinished stub, /root/reference/lib/
baz_auto_ber_bf.cc work(); ours is a complete self-synchronizing PN BER
tester), and the Viterbi decoder the auto_fec loop needs
(python/auto_fec.py chains into the host runtime's Viterbi; this
framework supplies its own).

TPU formulations: the scrambler XORs against a host-precomputed
m-sequence (pure gather — the LFSR recurrence never runs on device);
puncturing is cumsum-compaction; the Viterbi add-compare-select runs as
a ``lax.scan`` over time with the 64-state butterfly fully vectorized
(gathers over precomputed trellis tables) and a reverse scan traceback.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.decode import _compact


# ---------------------------------------------------------------------------
# LFSR utilities (host side, exact integer math)
# ---------------------------------------------------------------------------

def lfsr_bits(mask: int, seed: int, reg_len: int, n: int) -> np.ndarray:
    """Galois-style LFSR bit stream (GR lfsr convention:
    out = reg & 1; newbit = popcount(reg & mask) % 2;
    reg = (reg >> 1) | (newbit << (reg_len - 1)))."""
    reg = int(seed)
    out = np.empty(n, np.uint8)
    for i in range(n):
        out[i] = reg & 1
        newbit = bin(reg & mask).count("1") % 2
        reg = (reg >> 1) | (newbit << (reg_len - 1))
    return out


class AdditiveScrambler(Block):
    """Additive (synchronous) scrambler — baz_additive_scrambler_bb
    equivalent: XOR each byte with ``bits_per_byte`` LFSR bits, reset
    the LFSR every ``count`` bytes (0 = never).

    The LFSR stream is precomputed on the host (exact), so the device op
    is one XOR against a gathered pattern — descrambling is the same
    block (XOR is an involution).
    """

    MAX_PRECOMPUTE = 1 << 22  # bits

    def __init__(self, mask: int = 0x8A, seed: int = 0x7F, reg_len: int = 7,
                 count: int = 0, bits_per_byte: int = 1, name=None):
        super().__init__(name)
        self.count = int(count)
        bpb = int(bits_per_byte)
        if count > 0:
            nbits = count * bpb
        else:
            # without resets the byte pattern repeats after at most
            # `period` bytes (bit period 2^reg_len - 1)
            period = (1 << reg_len) - 1
            nbits = period * bpb
        if nbits > self.MAX_PRECOMPUTE:
            raise NotImplementedError(
                "LFSR period too long to precompute; use a shorter register")
        bits = lfsr_bits(mask, seed, reg_len, nbits)
        weights = (1 << np.arange(bpb)).astype(np.uint8)
        self.pattern = (bits.reshape(-1, bpb) * weights).sum(1).astype(np.uint8)
        self.period = len(self.pattern)  # bytes until repeat/reset

    def init_state(self):
        return dict(offset=np.int32(0))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        idx = (state["offset"] + jnp.arange(n, dtype=jnp.int32)) % self.period
        pat = jnp.asarray(self.pattern)[idx]
        y = (x.data.astype(jnp.uint8) ^ pat)
        new_off = (state["offset"] + x.count) % self.period
        return dict(offset=new_off), (x.like(y, count=x.count),)


# ---------------------------------------------------------------------------
# puncturing (baz_puncture_bb / baz_depuncture_ff)
# ---------------------------------------------------------------------------

class Puncture(Block):
    """Drop bits where the puncture matrix is 0 (runtime-settable via
    params, swig/baz_swig.i:244-270)."""

    def __init__(self, matrix: Sequence[int], name=None):
        super().__init__(name)
        self.p = len(matrix)
        self.matrix0 = np.asarray(matrix, np.int32)

    def init_state(self):
        return dict(phase=np.int32(0))

    def init_params(self):
        return dict(matrix=self.matrix0)

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        idx = (state["phase"] + jnp.arange(n, dtype=jnp.int32)) % self.p
        keep = (params["matrix"][idx] != 0) & x.valid_mask()
        out, count = _compact(x.data, keep)
        new_phase = (state["phase"] + x.count) % self.p
        return dict(phase=new_phase), (Stream(out, count, x.meta),)


class Depuncture(Block):
    """Insert erasures (``zero_value``) where the matrix is 0. Output is
    len(matrix)/sum(matrix) times the input rate (statically bounded)."""

    def __init__(self, matrix: Sequence[int], zero_value: float = 0.0,
                 name=None):
        super().__init__(name)
        self.matrix0 = np.asarray(matrix, np.int32)
        self.p = len(matrix)
        self.k = int(self.matrix0.sum())
        self.zero = float(zero_value)

    def init_state(self):
        return dict(phase=np.int32(0))  # position in the matrix cycle

    def init_params(self):
        return dict(matrix=self.matrix0)

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        cap = int(np.ceil(n * self.p / self.k)) + self.p
        opos = (state["phase"] + jnp.arange(cap, dtype=jnp.int32)) % self.p
        is_data = params["matrix"][opos] != 0
        src = jnp.cumsum(is_data.astype(jnp.int32)) - 1  # input index per slot
        valid = src < x.count
        gathered = x.data[jnp.clip(src, 0, n - 1)]
        out = jnp.where(is_data & valid, gathered,
                        jnp.asarray(self.zero, x.data.dtype))
        # stop at the last slot whose data source exists
        count = jnp.sum((is_data & valid).astype(jnp.int32)) \
            + jnp.sum((~is_data & valid).astype(jnp.int32))
        new_phase = (state["phase"] + count) % self.p
        out = jnp.where(jnp.arange(cap) < count, out, 0)
        return dict(phase=new_phase), (Stream(out, count, x.meta),)


# ---------------------------------------------------------------------------
# BER estimator vs PN reference
# ---------------------------------------------------------------------------

class PNBERv(Block):
    """Self-synchronizing BER tester against an LFSR PN sequence.

    The register is fed with *received* bits, so it re-syncs within
    ``degree`` bits of any slip; each error then appears ~weight(mask)+1
    times (standard PN BER-tester behavior). Outputs a running BER
    (EWMA) per sample.
    """

    def __init__(self, degree: int = 7, mask: int = 0x60, alpha: float = 1e-3,
                 name=None):
        super().__init__(name)
        self.degree = int(degree)
        self.mask = int(mask)
        self.alpha = float(alpha)

    def init_state(self):
        return dict(reg=np.uint32(0), warm=np.int32(0),
                    ber=np.float32(0.0))

    def apply(self, state, params, x: Stream):
        deg, mask, a = self.degree, jnp.uint32(self.mask), self.alpha

        def step(s, bit):
            bit = (bit != 0).astype(jnp.uint32)
            pred = jax.lax.population_count(s["reg"] & mask) % 2
            err = (pred != bit) & (s["warm"] >= deg)
            reg = ((s["reg"] << 1) | bit) & jnp.uint32((1 << deg) - 1)
            ber = jnp.where(s["warm"] >= deg,
                            (1 - a) * s["ber"] + a * err.astype(jnp.float32),
                            s["ber"])
            return dict(reg=reg, warm=s["warm"] + 1, ber=ber), ber

        new_state, bers = jax.lax.scan(step, state, x.data)
        return new_state, (x.like(bers.astype(jnp.float32), count=x.count),)


# ---------------------------------------------------------------------------
# Viterbi decoder (rate 1/2, constraint length K)
# ---------------------------------------------------------------------------

def _build_trellis(k: int, polys):
    """Precompute (prev_states[64,2], prev_bits, branch_out[64,2,2])."""
    ns = 1 << (k - 1)
    next_state = np.zeros((ns, 2), np.int32)
    outs = np.zeros((ns, 2, 2), np.int8)
    for s in range(ns):
        for b in (0, 1):
            reg = (b << (k - 1)) | s          # newest bit at MSB
            next_state[s, b] = reg >> 1
            for j, p in enumerate(polys):
                outs[s, b, j] = bin(reg & p).count("1") % 2
    # invert: predecessors of each state
    prev = np.zeros((ns, 2), np.int32)
    prev_bit = np.zeros((ns, 2), np.int32)
    prev_out = np.zeros((ns, 2, 2), np.int8)
    fill = np.zeros(ns, np.int32)
    for s in range(ns):
        for b in (0, 1):
            t = next_state[s, b]
            prev[t, fill[t]] = s
            prev_bit[t, fill[t]] = b
            prev_out[t, fill[t]] = outs[s, b]
            fill[t] += 1
    assert (fill == 2).all()
    return prev, prev_bit, prev_out


def conv_encode(bits: np.ndarray, k: int = 7,
                polys=(0o171, 0o133)) -> np.ndarray:
    """Host-side rate-1/2 convolutional encoder matching viterbi_decode's
    trellis convention (newest bit at the register MSB). Returns [T, 2]."""
    s = 0
    out = np.zeros((len(bits), 2), np.int8)
    for i, b in enumerate(np.asarray(bits).astype(int)):
        reg = (b << (k - 1)) | s
        for j, p in enumerate(polys):
            out[i, j] = bin(reg & p).count("1") % 2
        s = reg >> 1
    return out


def viterbi_decode(metrics: jax.Array, k: int = 7,
                   polys=(0o171, 0o133)) -> jax.Array:
    """Soft-decision Viterbi, rate 1/2.

    metrics: [T, 2] float — soft symbols (positive ~ coded bit 1).
    Returns [T] decoded bits (uint8). Fully vectorized ACS over the
    2^(K-1)-state trellis per step; traceback as a reverse scan.
    """
    ns = 1 << (k - 1)
    prev, prev_bit, prev_out = _build_trellis(k, polys)
    prev = jnp.asarray(prev)
    prev_bit_t = jnp.asarray(prev_bit)
    exp = jnp.asarray(prev_out.astype(np.float32) * 2.0 - 1.0)  # [ns,2,2] +-1

    def acs(pm, r):
        # branch metric for (state t, pred j): r . expected
        bm = jnp.einsum("tjc,c->tj", exp, r)
        cand = pm[prev] + bm                      # [ns, 2]
        choice = jnp.argmax(cand, axis=1)         # [ns]
        new_pm = jnp.max(cand, axis=1)
        new_pm = new_pm - jnp.max(new_pm)         # normalize (no overflow)
        return new_pm, choice.astype(jnp.int32)

    pm0 = jnp.where(jnp.arange(ns) == 0, 0.0, -1e9)
    pm_final, choices = jax.lax.scan(acs, pm0, metrics)

    # traceback from the best final state
    def back(s, ch):
        j = ch[s]
        bit = prev_bit_t[s, j]
        return prev[s, j], bit
    s_final = jnp.argmax(pm_final).astype(jnp.int32)
    _, bits = jax.lax.scan(back, s_final, choices, reverse=True)
    return bits.astype(jnp.uint8)


class ViterbiDecoder(Block):
    """Streaming Viterbi with block-overlap state continuation.

    Processes each block independently with a carried trellis warmup of
    ``overlap`` symbol pairs (decode latency), which makes block
    boundaries bit-consistent with serial decoding for any overlap well
    beyond ~5K symbols (traceback depth).
    """

    def __init__(self, k: int = 7, polys=(0o171, 0o133), overlap: int = 96,
                 name=None):
        super().__init__(name)
        self.k = int(k)
        self.polys = tuple(polys)
        self.overlap = int(overlap)

    def init_state(self):
        return dict(tail=np.zeros((self.overlap, 2), np.float32),
                    warm=np.int32(0))

    def apply(self, state, params, x: Stream):
        # x.data: [N, 2] soft pairs
        ext = jnp.concatenate([state["tail"], x.data.astype(jnp.float32)])
        bits = viterbi_decode(ext, self.k, self.polys)
        out = bits[self.overlap:]
        new_state = dict(tail=ext[-self.overlap:],
                         warm=jnp.minimum(state["warm"] + 1, 1000))
        return new_state, (x.like(out, count=x.count),)


class GLFSRSource(Block):
    """GLFSR bit source (gr glfsr_source_b equivalent — the stimulus of
    the reference tutorial's BER and histogram flowgraphs,
    samples/tutorial/part-01/part-02).

    Emits ``block_size`` LFSR bits per step (uint8 0/1, or f32 +/-1 with
    ``bipolar=True``). The register update runs as a ``lax.scan``; two
    conventions: 'gr' = Galois (glfsr masks), 'pn' = left-shift
    Fibonacci with XOR-fold parity (matches :class:`PNBERv`).
    """

    n_in = 0

    def __init__(self, degree: int, block_size: int, *, mask: int = 0,
                 seed: int = 1, bipolar: bool = False,
                 convention: str = "gr", name=None):
        super().__init__(name)
        if not (1 <= degree <= 32):
            raise ValueError("degree must be in [1, 32]")
        if convention not in ("gr", "pn"):
            raise ValueError("convention must be 'gr' or 'pn'")
        self.degree = int(degree)
        self.mask = int(mask) if mask else _default_poly(self.degree)
        self.seed = int(seed) or 1
        self.block_size = int(block_size)
        self.bipolar = bool(bipolar)
        # 'gr': right-shift Galois (lfsr_bits); 'pn': left-shift
        # Fibonacci — the convention ops.fec.PNBERv self-syncs to, so
        # GLFSRSource(convention='pn') -> PNBERv is a closed BER loop.
        self.convention = convention

    def init_state(self):
        return dict(reg=np.uint32(self.seed))

    def apply(self, state, params):
        mask = jnp.uint32(self.mask)
        regmask = jnp.uint32((1 << self.degree) - 1)

        def parity(v):
            for s in (16, 8, 4, 2, 1):  # XOR-fold popcount parity
                v = v ^ (v >> s)
            return v & jnp.uint32(1)

        def step_gr(reg, _):
            # GR glfsr convention: Galois form — when the output bit is
            # 1, the polynomial mask XORs into the shifted register
            out = reg & jnp.uint32(1)
            reg2 = (reg >> 1) ^ jnp.where(out != 0, mask, jnp.uint32(0))
            return reg2, out.astype(jnp.uint8)

        def step_pn(reg, _):
            b = parity(reg & mask)
            reg2 = ((reg << 1) | b) & regmask
            return reg2, b.astype(jnp.uint8)

        step = step_gr if self.convention == "gr" else step_pn
        reg, bits = jax.lax.scan(step, state["reg"], None,
                                 length=self.block_size)
        if self.bipolar:
            data = bits.astype(jnp.float32) * 2.0 - 1.0
        else:
            data = bits
        from grbaz_tpu.core.stream import Stream, StreamMeta
        out = Stream(data=data, count=jnp.int32(self.block_size),
                     meta=StreamMeta.start(1.0))
        return dict(reg=reg), (out,)


def _default_poly(degree: int) -> int:
    """Primitive polynomial masks by degree (GR glfsr table values for
    the common degrees; maximal-length sequences)."""
    table = {1: 0x1, 2: 0x3, 3: 0x5, 4: 0x9, 5: 0x12, 6: 0x21, 7: 0x41,
             8: 0x8E, 9: 0x108, 10: 0x204, 11: 0x402, 12: 0x829,
             13: 0x100D, 14: 0x2015, 15: 0x4001, 16: 0x8016,
             17: 0x10004, 18: 0x20013, 19: 0x40013, 20: 0x80004,
             21: 0x100002, 22: 0x200001, 23: 0x400010, 24: 0x80000D,
             25: 0x1000004, 26: 0x2000023, 27: 0x4000013, 28: 0x8000004,
             29: 0x10000002, 30: 0x20000029, 31: 0x40000004,
             32: 0x80000057}
    return table[degree]
