"""Tensor parallelism: contraction-dimension sharding for big kernels.

The ML analog is Megatron-style weight sharding: the *weights* (FIR tap
bank / correlator pattern bank) are split across a mesh axis, each
device computes a partial contraction against (replicated) activations,
and a ``psum`` over ICI produces the full result. For software radio
this is how a filter too big for one chip's HBM/MXU-tile budget — a
channel-sorting polyphase bank, a massive matched filter, a correlator
pattern bank (/root/reference/lib/baz_correlator.cc loads arbitrary-
length sync patterns) — runs as one logical kernel over the mesh.

Two kernels here:

* :func:`tp_fir_decimate` — a decimating FIR whose taps are sharded
  over the 'tp' axis. Device p owns tap chunk ``h[p*T/P : (p+1)*T/P]``
  and convolves it against the correspondingly-offset frame slice; the
  partials sum exactly (f32 adds commute across the psum because each
  output is a disjoint-range partial sum — identical term grouping to
  the serial polyphase band sum).
* :class:`TPFIRDecimator` — the streaming Block form with carried tail,
  drop-in compatible with ``ops.fir.FIRDecimator`` (same state layout).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.fir import fir_decimate_frame, prepare_taps


def shard_taps(taps: Sequence[float], decim: int, n_shards: int) -> np.ndarray:
    """Reverse + pad taps to ``n_shards`` equal chunks of a multiple of
    ``decim`` each. Returns ``[n_shards, chunk]`` (chunk = padded_T /
    n_shards); the concatenation equals ``prepare_taps`` output padded
    at the *front* (leading zeros shift harmlessly — they multiply
    samples older than the filter span, which the frame provides)."""
    h_rev = np.asarray(taps, np.float32)[::-1]
    chunk = int(math.ceil(len(h_rev) / (decim * n_shards))) * decim
    tpad = chunk * n_shards
    h = np.concatenate([np.zeros(tpad - len(h_rev), np.float32), h_rev])
    return h.reshape(n_shards, chunk)


def tp_fir_decimate(frame: jax.Array, h_chunks: jax.Array, decim: int,
                    axis: str = "tp") -> jax.Array:
    """Inside shard_map: frame [replicated], h_chunks [1, chunk] (this
    device's slice of the [P, chunk] bank). Output: full y, replicated.

    Device p's partial: ``sum_t h[p*chunk + t] * frame[k*decim + p*chunk
    + t]`` — a plain decimating FIR over the frame shifted by p*chunk.
    """
    p = lax.axis_index(axis)
    chunk = h_chunks.shape[-1]
    n_shards = lax.psum(1, axis)
    tpad = chunk * n_shards
    n_out = (frame.shape[0] - (tpad - 1)) // decim
    # shift the frame so this device's tap chunk aligns at offset 0;
    # fir_decimate_frame wants (chunk-1) leading history + n_out*decim
    # new samples — for p = P-1 this ends exactly at frame's last sample
    start = p * chunk
    local = lax.dynamic_slice_in_dim(frame, start,
                                     chunk - 1 + n_out * decim)
    partial = fir_decimate_frame(local, h_chunks.reshape(chunk), decim)
    return lax.psum(partial, axis)


class TPFIRDecimator(Block):
    """Tap-sharded decimating FIR block over mesh axis ``tp``.

    Same streaming contract as ``ops.fir.FIRDecimator`` (carried tail =
    filter history), but taps live sharded: ``init_params()['h']`` is
    ``[P, chunk]`` and should be placed with
    ``NamedSharding(mesh, P('tp', None))``. Apply must run inside a jit
    whose mesh is active (use :meth:`make_step`)."""

    def __init__(self, taps, decim: int, mesh: Mesh, axis: str = "tp",
                 dtype=jnp.complex64, name=None):
        super().__init__(name)
        self.decim = int(decim)
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.h_chunks = shard_taps(taps, self.decim, self.n_shards)
        self.tpad = self.h_chunks.size
        self.hist = self.tpad - 1
        self.dtype = dtype

    def init_state(self):
        return dict(tail=np.zeros((self.hist,), self.dtype))

    def init_params(self):
        return dict(h=self.h_chunks)

    def make_step(self):
        """Jitted ``(state, params, x_data) -> (state', y)`` with the
        taps sharded over 'tp' and everything else replicated."""
        def local(tail, h_local, x):
            frame = jnp.concatenate([tail, x])
            if jnp.iscomplexobj(frame):
                yr = tp_fir_decimate(frame.real, h_local, self.decim,
                                     self.axis)
                yi = tp_fir_decimate(frame.imag, h_local, self.decim,
                                     self.axis)
                y = lax.complex(yr, yi)
            else:
                y = tp_fir_decimate(frame, h_local, self.decim, self.axis)
            return frame[-self.hist:], y

        sharded = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P()),
            out_specs=(P(), P()),
            check_vma=False)

        @jax.jit
        def step(state, params, x):
            tail, y = sharded(state["tail"], params["h"], x)
            return dict(tail=tail), y

        return step

    def apply(self, state, params, x: Stream):
        frame = jnp.concatenate([state["tail"], x.data])
        if jnp.iscomplexobj(frame):
            y = lax.complex(
                tp_fir_decimate(frame.real, params["h"], self.decim, self.axis),
                tp_fir_decimate(frame.imag, params["h"], self.decim, self.axis))
        else:
            y = tp_fir_decimate(frame, params["h"], self.decim, self.axis)
        new_state = dict(tail=frame[-self.hist:])
        out = x.like(y, count=x.count // self.decim,
                     rate_scale=1.0 / self.decim)
        return new_state, (out,)
