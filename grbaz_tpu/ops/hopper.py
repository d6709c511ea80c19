"""In-graph frequency-hop demux (baz_hopper's stream side).

The reference hopper (/root/reference/lib/baz_hopper.cc:299-340,
lib/baz_hopper.h:58-100) does two jobs: (1) schedule
``set_command_time`` + ``set_rx_freq`` retunes ahead of stream time,
and (2) consume the tagged RX stream, drop ``drop_length`` retune
transient samples after each hop, and demux the dwell chunks to one
output per frequency. Job (1) is host work — net/hw_control.FreqHopper.
This module is job (2), reformulated for XLA: because the hop schedule
is deterministic (fixed dwell on the absolute sample grid), the
chunk↔frequency mapping is a *pure function of the sample index* — no
tags, no per-sample host loop. Each block computes its dwell phase from
a tiny int32 carry, masks the transient, and compacts each frequency's
samples to the front of its output lane with a vectorized
cumsum-scatter.

Outputs are ``n_freqs`` lanes of shape [N] with validity counts — the
contiguous per-frequency chunk streams of the reference, block-
synchronous. Boundary-exact across blocks: the carry (dwell offset +
channel index) chains the grid precisely.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream


class HopperDemux(Block):
    """Demux a hopped RX stream into per-frequency lanes.

    ``dwell`` samples per frequency, cycling through ``n_freqs``
    channels; the first ``drop_length`` samples after each retune are
    discarded (retune transients, reference ``drop_length``).
    """

    def __init__(self, n_freqs: int, dwell: int, drop_length: int = 0,
                 name=None):
        super().__init__(name)
        assert 0 <= drop_length < dwell
        self.n_freqs = int(n_freqs)
        self.dwell = int(dwell)
        self.drop_length = int(drop_length)
        self.n_out = self.n_freqs

    def init_state(self):
        return dict(chan=np.int32(0),   # current frequency index
                    off=np.int32(0))    # offset within current dwell

    def apply(self, state, params, x: Stream):
        n = x.capacity
        d, f = self.dwell, self.n_freqs
        pos = state["off"] + jnp.arange(n, dtype=jnp.int32)
        off = pos % d
        chan = (state["chan"] + pos // d) % f
        keep = (off >= self.drop_length) & (jnp.arange(n) < x.count)

        onehot = (chan[None, :] == jnp.arange(f, dtype=jnp.int32)[:, None])
        sel = onehot & keep[None, :]                       # [F, N]
        # compact each lane's kept samples to the front
        slot = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
        counts = jnp.sum(sel.astype(jnp.int32), axis=1)
        slot = jnp.where(sel, slot, n - 1)

        def lane(sl, m):
            out = jnp.zeros((n,), x.data.dtype)
            return out.at[sl].add(jnp.where(m, x.data, 0))

        lanes = jax.vmap(lane)(slot, sel)
        end = state["off"] + n
        new_state = dict(chan=(state["chan"] + end // d) % f,
                         off=end % d)
        outs = tuple(
            Stream(lanes[i], counts[i],
                   x.meta.advanced(0, rate_scale=1.0 / f))
            for i in range(f))
        return new_state, outs
