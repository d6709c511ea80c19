"""Sample-block stream datatypes.

The reference framework moves samples between blocks through GNU Radio's
circular buffers, with metadata carried as stream tags (``rx_time``,
``tx_sob``/``tx_eob``) and fault state signalled out-of-band through
BorIP header flags (/root/reference/lib/baz_udp_source.cc:118-127).

Here a *stream* is a fixed-shape array block plus explicit, traced
metadata:

* ``data``    — ``[N]`` or ``[N, vlen]`` array (complex64 / float32 / uint8 ...)
* ``count``   — int32 scalar: number of *valid* leading samples (<= N).
  Rate-changing kernels (fractional resampler, gates) write fewer than N
  samples; downstream kernels and the host executor mask on ``count``.
* ``meta``    — :class:`StreamMeta`: absolute sample index (64-bit as two
  uint32 limbs — exact, no x64 emulation needed on TPU), time epoch, and
  BorIP-compatible fault flags.

Everything is a registered pytree so streams flow through ``jax.jit`` /
``lax.scan`` / ``shard_map`` unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class stream_flags:
    """Stream fault/epoch flags.

    Wire-compatible with the BorIP UDP header flag byte
    (/root/reference/lib/baz_udp_source.cc:118-127): hardware / network /
    buffer overruns, empty payload, stream start/end.
    """

    NONE = 0x00
    HARDWARE_OVERRUN = 0x01
    NETWORK_OVERRUN = 0x02
    BUFFER_OVERRUN = 0x04
    EMPTY_PAYLOAD = 0x08
    STREAM_START = 0x10
    STREAM_END = 0x20


def _u64_to_limbs(n: int) -> tuple[np.uint32, np.uint32]:
    n = int(n)
    return np.uint32(n & 0xFFFFFFFF), np.uint32((n >> 32) & 0xFFFFFFFF)


def limbs_add(lo: jax.Array, hi: jax.Array, delta: jax.Array):
    """Exact 64-bit add of a uint32 ``delta`` to a (lo, hi) uint32 pair.

    uint32 addition wraps mod 2^32 in XLA, so carry detection is exact:
    carry happened iff the wrapped sum is less than either addend.
    """
    delta = delta.astype(jnp.uint32)
    new_lo = lo + delta
    carry = (new_lo < delta).astype(jnp.uint32)
    return new_lo, hi + carry


def limbs_add_i32(lo: jax.Array, hi: jax.Array, delta: jax.Array):
    """Exact 64-bit add of a SIGNED int32 ``delta`` to uint32 limbs.

    The delta is sign-extended to 64 bits: the high limb receives the
    carry out of the low add plus the sign extension (all-ones for a
    negative delta). Broadcasting works elementwise (vector deltas).
    """
    d32 = delta.astype(jnp.int32)
    du = d32.astype(jnp.uint32)
    new_lo = lo.astype(jnp.uint32) + du
    carry = (new_lo < du).astype(jnp.uint32)
    sign_ext = jnp.where(d32 < 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    return new_lo, hi.astype(jnp.uint32) + carry + sign_ext


def bits_to_f32(x: jax.Array) -> jax.Array:
    """Bitcast uint32/int32 -> float32 (exact payload in an f32 slot).

    Event arrays are float32; absolute sample indices must not be
    *converted* to f32 (exact only to 2^24 — ~5 s at the RTL full rate,
    where the reference keeps exact uhd time, lib/baz_gate.cc:147-153).
    Bitcasting preserves all 32 bits; decode with :func:`f32_to_bits` /
    :func:`decode_u32`.
    """
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def f32_to_bits(f: jax.Array, dtype=jnp.uint32) -> jax.Array:
    """Inverse of :func:`bits_to_f32` (in-graph)."""
    return jax.lax.bitcast_convert_type(f, dtype)


def decode_u32(f) -> np.ndarray:
    """Host-side decode of bitcast-f32 fields back to uint32."""
    return np.asarray(f, np.float32).view(np.uint32)


def decode_i32(f) -> np.ndarray:
    """Host-side decode of bitcast-f32 fields back to int32."""
    return np.asarray(f, np.float32).view(np.int32)


def decode_abs_index(hi_f, lo_f) -> "np.ndarray | int":
    """Host-side decode of a (hi, lo) bitcast-f32 limb pair to a python
    int (or int64 array) absolute sample index."""
    hi = decode_u32(hi_f).astype(np.int64)
    lo = decode_u32(lo_f).astype(np.int64)
    return (hi << 32) | lo


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamMeta:
    """Traced per-block stream metadata.

    Mirrors the reference's ``rx_time`` tag semantics
    (/root/reference/lib/baz_time_keeper.cc:118-155): absolute time of the
    first sample of the block is

        ``epoch_sec + epoch_frac + (abs_index / sample_rate)``

    where ``abs_index`` is the exact 64-bit sample counter carried as two
    uint32 limbs (``abs_lo``, ``abs_hi``).
    """

    abs_lo: jax.Array  # uint32 — low limb of absolute sample index
    abs_hi: jax.Array  # uint32 — high limb
    epoch_sec: jax.Array  # int32  — integer seconds of stream epoch
    epoch_frac: jax.Array  # float32 — fractional seconds of stream epoch
    flags: jax.Array  # uint32 — stream_flags bitmask
    seq: jax.Array  # uint32 — sequence/epoch counter (BorIP seq idx)
    sample_rate: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    @staticmethod
    def start(sample_rate: float, *, epoch_sec: int = 0, epoch_frac: float = 0.0,
              abs_index: int = 0) -> "StreamMeta":
        lo, hi = _u64_to_limbs(abs_index)
        return StreamMeta(
            abs_lo=jnp.uint32(lo),
            abs_hi=jnp.uint32(hi),
            epoch_sec=jnp.int32(epoch_sec),
            epoch_frac=jnp.float32(epoch_frac),
            flags=jnp.uint32(stream_flags.NONE),
            seq=jnp.uint32(0),
            sample_rate=float(sample_rate),
        )

    def advanced(self, nsamples, *, rate_scale: float = 1.0) -> "StreamMeta":
        """Meta for the block following this one (``nsamples`` consumed).

        ``rate_scale`` != 1 re-bases the counter domain for rate-changing
        kernels (decimators/resamplers): the output stream's ``abs_index``
        counts *output* samples at ``sample_rate * rate_scale``.
        """
        lo, hi = limbs_add(self.abs_lo, self.abs_hi, jnp.uint32(nsamples))
        return dataclasses.replace(
            self, abs_lo=lo, abs_hi=hi, seq=self.seq + jnp.uint32(1),
            sample_rate=self.sample_rate * rate_scale,
        )

    def with_rate(self, sample_rate: float) -> "StreamMeta":
        return dataclasses.replace(self, sample_rate=float(sample_rate))

    def time_of_first_sample(self) -> jax.Array:
        """Absolute time (float32 seconds, approximate) of sample 0.

        For exact timing use (epoch, abs limbs) directly; this helper is
        for display/trigger paths that tolerate f32.
        """
        idx = self.abs_hi.astype(jnp.float32) * jnp.float32(2.0 ** 32) \
            + self.abs_lo.astype(jnp.float32)
        return self.epoch_sec.astype(jnp.float32) + self.epoch_frac \
            + idx / jnp.float32(self.sample_rate)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Stream:
    """A block of samples with validity count and metadata."""

    data: jax.Array
    count: jax.Array  # int32 scalar, number of valid samples (<= data.shape[0])
    meta: StreamMeta

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @staticmethod
    def full(data: jax.Array, meta: Optional[StreamMeta] = None,
             sample_rate: float = 1.0) -> "Stream":
        """Wrap an array as a fully-valid stream block."""
        if meta is None:
            meta = StreamMeta.start(sample_rate)
        return Stream(data=data, count=jnp.int32(data.shape[0]), meta=meta)

    def valid_mask(self) -> jax.Array:
        """Boolean [N] mask of valid samples."""
        n = self.data.shape[0]
        return jnp.arange(n, dtype=jnp.int32) < self.count

    def masked_data(self, fill=0) -> jax.Array:
        mask = self.valid_mask()
        if self.data.ndim > 1:
            mask = mask.reshape((-1,) + (1,) * (self.data.ndim - 1))
        return jnp.where(mask, self.data, jnp.asarray(fill, self.data.dtype))

    def like(self, data: jax.Array, count=None, *, rate_scale: float = 1.0) -> "Stream":
        """New stream with same meta lineage (possibly rate-scaled)."""
        meta = self.meta
        if rate_scale != 1.0:
            meta = meta.with_rate(meta.sample_rate * rate_scale)
        if count is None:
            count = jnp.int32(data.shape[0])
        return Stream(data=data, count=jnp.asarray(count, jnp.int32), meta=meta)
