"""Closed-loop FEC parameter search (auto_fec).

Capability parity with python/auto_fec.py (SURVEY.md §3.5): received
QPSK-ish symbols have unknown constellation rotation / conjugation /
pair ordering / puncture phase; a controller steps through the
transform space while watching BER and locks when it drops below
threshold.

Reference structure: a hier block of multiply/delay/depuncture/Viterbi
blocks mutated by a watcher thread (:132) stepping ``auto_fec_xform``
(:45). Here the whole transform chain + Viterbi + BER estimate is ONE
jitted function of traced transform params, so the controller retunes a
running graph with zero recompiles; BER is decision-directed
(re-encode the decoded bits, compare with the sliced input), so no
reference data is needed.

Transform space mirrors auto_fec_xform.next (:99-130): rotation (x4) ->
conjugation (x2) -> viterbi_delay (x2) -> viterbi_swap (x2) ->
puncture_delay (x 2*rate_num).
"""

from __future__ import annotations

import itertools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.ops.fec import _build_trellis, conv_encode, viterbi_decode

_ROTATIONS = np.array([1.0, 1.0j, -1.0, -1.0j], np.complex64)


def fec_eval(symbols: jax.Array, rotation: jax.Array, conjugate: jax.Array,
             vit_delay: jax.Array, vit_swap: jax.Array,
             k: int = 7, polys=(0o171, 0o133)):
    """Apply the transform + Viterbi + decision-directed BER.

    symbols: [N] complex64 QPSK symbols carrying (bit0, bit1) in
    (real, imag) signs. All transform args are traced scalars
    (int32 rotation index, bool conjugate/delay/swap).

    Returns (bits [N*2? -> N pairs decoded], ber scalar).
    """
    s = jnp.where(conjugate, jnp.conj(symbols), symbols)
    s = s * jnp.asarray(_ROTATIONS)[rotation]
    # symbol -> soft code-bit pair
    soft = jnp.stack([s.real, s.imag], axis=1)  # [N, 2]
    soft = jnp.where(vit_swap, soft[:, ::-1], soft)
    # viterbi_delay: realign pair boundary by one code bit
    flat = soft.reshape(-1)
    delayed = jnp.concatenate([flat[1:], flat[:1]]).reshape(-1, 2)
    soft = jnp.where(vit_delay, delayed, soft)
    bits = viterbi_decode(soft, k, polys)
    # decision-directed BER: re-encode and compare to the hard slice
    ns = 1 << (k - 1)
    prev, prev_bit, prev_out = _build_trellis(k, polys)
    # forward re-encode via scan
    next_state = np.zeros((ns, 2), np.int32)
    outs = np.zeros((ns, 2, 2), np.int8)
    for st in range(ns):
        for b in (0, 1):
            reg = (b << (k - 1)) | st
            next_state[st, b] = reg >> 1
            for j, p in enumerate(polys):
                outs[st, b, j] = bin(reg & p).count("1") % 2
    ns_t = jnp.asarray(next_state)
    outs_t = jnp.asarray(outs.astype(np.int32))

    def enc_step(state, b):
        o = outs_t[state, b]
        return ns_t[state, b], o

    _, re_encoded = jax.lax.scan(enc_step, jnp.int32(0),
                                 bits.astype(jnp.int32))
    hard = (soft > 0).astype(jnp.int32)
    # ignore the traceback-shallow tail
    n_eval = bits.shape[0] - 16
    errs = jnp.sum(jnp.abs(re_encoded[:n_eval] - hard[:n_eval]))
    ber = errs.astype(jnp.float32) / jnp.float32(2 * n_eval)
    return bits, ber


class AutoFEC:
    """Host controller + jitted evaluator.

    Feed symbol blocks with :meth:`feed`; the controller steps the
    transform space (reference ordering) until BER < ``threshold`` for
    ``settle`` consecutive blocks, then locks. Outputs decoded bits and
    a (ber, locked) status per block — the reference's three outputs.
    """

    def __init__(self, threshold: float = 0.05, settle: int = 2,
                 k: int = 7, polys=(0o171, 0o133)):
        self.threshold = float(threshold)
        self.settle = int(settle)
        self._eval = jax.jit(
            lambda sym, rot, conj, vd, vs: fec_eval(sym, rot, conj, vd, vs,
                                                    k, polys))
        # transform state
        self.rotation = 0
        self.conjugate = False
        self.vit_delay = False
        self.vit_swap = False
        self.locked = False
        self._good = 0
        self.last_ber = 1.0
        self.steps = 0

    def _advance(self):
        """Step the search space in the reference's order
        (rotation fastest, then conjugation, then delays)."""
        self.rotation = (self.rotation + 1) % 4
        if self.rotation != 0:
            return
        self.conjugate = not self.conjugate
        if self.conjugate:
            return
        self.vit_delay = not self.vit_delay
        if self.vit_delay:
            return
        self.vit_swap = not self.vit_swap

    def feed(self, symbols: np.ndarray):
        """Process one block: returns (bits, ber, locked)."""
        bits, ber = self._eval(
            jnp.asarray(symbols), jnp.int32(self.rotation),
            jnp.bool_(self.conjugate), jnp.bool_(self.vit_delay),
            jnp.bool_(self.vit_swap))
        ber = float(ber)
        self.last_ber = ber
        if not self.locked:
            if ber < self.threshold:
                self._good += 1
                if self._good >= self.settle:
                    self.locked = True
            else:
                self._good = 0
                self._advance()
                self.steps += 1
        elif ber > 4 * self.threshold + 0.2:
            # lost lock (the reference re-enters search on bad BER)
            self.locked = False
            self._good = 0
        return np.asarray(bits), ber, self.locked
