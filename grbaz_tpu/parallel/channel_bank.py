"""Dynamic channel bank: runtime add/remove decoders over one wideband stream.

The reference's ``multi_channel_decoder``
(/root/reference/python/multi_channel_decoder.py:29-126) spawns and
removes per-frequency decoder hier blocks at runtime with flowgraph
lock/unlock surgery. Under static XLA compilation the equivalent is a
**capacity-padded bank with active masks** (SURVEY.md §7 hard part 6):

* the bank is compiled once for ``capacity`` slots;
* each slot has traced params (LO increment, active flag);
* ``add_channel``/``remove_channel``/``retune`` mutate params only —
  the running program never recompiles;
* inactive slots still compute (SIMD lanes are free) but their outputs
  are masked and their state is frozen.

Input is ONE wideband stream [N]; every active slot extracts its own
frequency (rotate + shared-taps FIR decimate, vmapped over slots) and
FM-demodulates — the scanner front end of BASELINE config 5.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.fir import fir_decimate_frame, low_pass_taps, prepare_taps


class DynamicChannelBank(Block):
    """Wideband in -> [capacity, N/decim] FM-demodulated channels out.

    Outputs: (quad [C, N/decim] float32, active [C] uint8). Slot state
    freezes while inactive so re-activation starts clean.
    """

    n_out = 2

    def __init__(self, capacity: int, sample_rate: float, decim: int,
                 channel_width: float, transition: float,
                 max_deviation: float = 5e3, name=None):
        super().__init__(name)
        self.capacity = int(capacity)
        self.sample_rate = float(sample_rate)
        self.decim = int(decim)
        taps = low_pass_taps(1.0, sample_rate,
                             channel_width / 2 + transition / 2, transition)
        self.h_rev_pad = prepare_taps(taps, self.decim)
        self.hist = len(self.h_rev_pad) - 1
        self.demod_gain = np.float32(
            (sample_rate / decim) / (2 * np.pi * max_deviation))
        # host-side slot bookkeeping
        self._slots: Dict[int, float] = {}  # slot -> freq

    # -- host control API (the reference's add/remove at runtime) ----------
    def add_channel(self, params: dict, freq: float) -> int:
        """Activate a free slot at ``freq``; returns the slot id."""
        free = [i for i in range(self.capacity) if i not in self._slots]
        if not free:
            raise RuntimeError("channel bank at capacity")
        slot = free[0]
        self._slots[slot] = freq
        params["lo_inc"] = np.asarray(params["lo_inc"]).copy()
        params["active"] = np.asarray(params["active"]).copy()
        params["lo_inc"][slot] = exact.freq_to_turns_u32(-freq,
                                                         self.sample_rate)
        params["active"][slot] = 1
        return slot

    def remove_channel(self, params: dict, slot: int):
        self._slots.pop(slot, None)
        params["active"] = np.asarray(params["active"]).copy()
        params["active"][slot] = 0

    def retune(self, params: dict, slot: int, freq: float):
        if slot not in self._slots:
            raise KeyError(f"slot {slot} not active")
        self._slots[slot] = freq
        params["lo_inc"] = np.asarray(params["lo_inc"]).copy()
        params["lo_inc"][slot] = exact.freq_to_turns_u32(-freq,
                                                         self.sample_rate)

    def channels(self) -> Dict[int, float]:
        return dict(self._slots)

    # -- block protocol ------------------------------------------------------
    def init_state(self):
        c = self.capacity
        return dict(phase=np.zeros((c,), np.uint32),
                    tail=np.zeros((c, self.hist), np.complex64),
                    prev=np.ones((c,), np.complex64))

    def init_params(self):
        c = self.capacity
        return dict(lo_inc=np.zeros((c,), np.uint32),
                    active=np.zeros((c,), np.uint8))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        active = params["active"].astype(jnp.bool_)

        def per_slot(phase0, tail, prev, lo_inc, act):
            lo, phase_after = exact.oscillator(n, phase0, lo_inc)
            xr = x.data * lo
            frame = jnp.concatenate([tail, xr])
            y = fir_decimate_frame(frame, self.h_rev_pad, self.decim)
            shifted = jnp.concatenate([prev[None], y[:-1]])
            prod = y * jnp.conj(shifted)
            quad = jnp.arctan2(prod.imag, prod.real).astype(jnp.float32) \
                * self.demod_gain
            # freeze state while inactive
            new_phase = jnp.where(act, phase_after, phase0)
            new_tail = jnp.where(act, frame[-self.hist:], tail)
            new_prev = jnp.where(act, y[-1], prev)
            quad = jnp.where(act, quad, 0.0)
            return new_phase, new_tail, new_prev, quad

        phase, tail, prev, quad = jax.vmap(per_slot)(
            state["phase"], state["tail"], state["prev"],
            params["lo_inc"].astype(jnp.uint32), active)
        new_state = dict(phase=phase, tail=tail, prev=prev)
        out = Stream(quad, x.count // self.decim,
                     x.meta.with_rate(x.meta.sample_rate / self.decim))
        return new_state, (out, Stream(params["active"].astype(jnp.uint8)
                                       if isinstance(params["active"], np.ndarray)
                                       else params["active"].astype(jnp.uint8),
                                       jnp.int32(self.capacity), x.meta))
