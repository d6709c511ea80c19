"""Basic math / utility kernels.

TPU-native equivalents of gr-baz's small stream blocks (SURVEY.md §2.1
"DSP math" group) and the stock conversion blocks the reference chains
rely on (complex<->ishort for the BorIP wire format, char->float for the
RTL 8-bit path, etc.). All are vectorized block transforms; the few with
stream memory (delay, keep_one_in_n) carry explicit state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from grbaz_tpu.core.block import Block, FnBlock, block_from_fn
from grbaz_tpu.core.stream import Stream


# ---------------------------------------------------------------------------
# stateless element-wise blocks
# ---------------------------------------------------------------------------

@block_from_fn
def conjugate(x):
    return jnp.conj(x)


@block_from_fn
def complex_to_mag(x):
    return jnp.abs(x).astype(jnp.float32)


@block_from_fn
def complex_to_mag_squared(x):
    return (x.real * x.real + x.imag * x.imag).astype(jnp.float32)


@block_from_fn
def complex_to_arg(x):
    return jnp.arctan2(x.imag, x.real).astype(jnp.float32)


@block_from_fn
def real_part(x):
    return x.real.astype(jnp.float32)


@block_from_fn
def imag_part(x):
    return x.imag.astype(jnp.float32)


def multiply_const(k):
    def multiply_const(x):
        return x * k
    return FnBlock(multiply_const)  # auto-name keeps a uid: a graph may
    # hold several of these (explicit names must be unique per graph)


def add_const(k):
    def add_const(x):
        return x + k
    return FnBlock(add_const)


@block_from_fn(n_in=2)
def multiply(a, b):
    return a * b


@block_from_fn(n_in=2)
def add(a, b):
    return a + b


def float_to_complex():
    def float_to_complex(r, i):
        return jax.lax.complex(r, i)
    return FnBlock(float_to_complex, n_in=2)


# -- sample format conversions (wire / driver formats) ----------------------

@block_from_fn
def uchar_iq_to_complex(x):
    """Interleaved u8 IQ (RTL2832 native, offset-127.5) -> complex64.

    Equivalent of the reference's u8->complex convert in the RTL source
    hot loop (/root/reference/lib/baz_rtl_source_c.h:239-242).
    """
    f = (x.astype(jnp.float32) - 127.5) * (1.0 / 127.5)
    pairs = f.reshape(-1, 2)
    return jax.lax.complex(pairs[:, 0], pairs[:, 1])


@block_from_fn
def ishort_to_complex(x):
    """Interleaved int16 IQ (BorIP wire format,
    /root/reference/python/borip_server.py:31-50) -> complex64."""
    f = x.astype(jnp.float32) * (1.0 / 32767.0)
    pairs = f.reshape(-1, 2)
    return jax.lax.complex(pairs[:, 0], pairs[:, 1])


@block_from_fn
def complex_to_ishort(x):
    """complex64 -> interleaved int16 IQ (scale 32767, saturating)."""
    scaled = jnp.stack([x.real, x.imag], axis=-1).reshape(-1) * 32767.0
    return jnp.clip(jnp.round(scaled), -32768, 32767).astype(jnp.int16)


# ---------------------------------------------------------------------------
# pow / swap (baz_pow_cc, baz_swap_iq, baz_swap_ff)
# ---------------------------------------------------------------------------

class PowCC(Block):
    """out = in^exponent / in^div_exp, runtime-settable
    (/root/reference/lib/baz_pow_cc.cc via swig/baz_swig.i:211-224)."""

    def __init__(self, exponent: float = 1.0, div_exp: float = 0.0, name=None):
        super().__init__(name)
        self.e0, self.d0 = float(exponent), float(div_exp)

    def init_params(self):
        return dict(exponent=np.float32(self.e0), div_exp=np.float32(self.d0))

    def apply(self, state, params, x: Stream):
        e = params["exponent"] - params["div_exp"]
        mag = jnp.abs(x.data)
        ang = jnp.arctan2(x.data.imag, x.data.real)
        out_mag = jnp.where(mag > 0, jnp.exp(e * jnp.log(jnp.maximum(mag, 1e-30))), 0.0)
        out_ang = ang * e
        y = (out_mag * jnp.exp(1j * out_ang)).astype(x.data.dtype)
        return state, (x.like(y, count=x.count),)


class SwapIQ(Block):
    """Swap I/Q, runtime-switchable (baz_swap, swig/baz_swig.i:274-285)."""

    def __init__(self, swap: bool = True, name=None):
        super().__init__(name)
        self.swap0 = bool(swap)

    def init_params(self):
        return dict(swap=np.bool_(self.swap0))

    def apply(self, state, params, x: Stream):
        swapped = jax.lax.complex(x.data.imag, x.data.real)
        y = jnp.where(params["swap"], swapped, x.data)
        return state, (x.like(y, count=x.count),)


# ---------------------------------------------------------------------------
# variable delay (baz_delay)
# ---------------------------------------------------------------------------

class VariableDelay(Block):
    """Runtime-variable delay, zero-filling on increase
    (/root/reference/lib/baz_delay.cc:64,95-137).

    Unlike stock GR delay the amount is adjustable live: ``params['delay']``
    may change between blocks. When it increases by k the first k output
    samples of the next block are zeros (the reference's zero-fill), and
    decreasing jumps the stream forward.
    """

    def __init__(self, max_delay: int, delay: int = 0, dtype=jnp.complex64,
                 name=None):
        super().__init__(name)
        self.max_delay = int(max_delay)
        self.delay0 = int(delay)
        self.dtype = dtype
        if not 0 <= delay <= max_delay:
            raise ValueError("delay must be in [0, max_delay]")

    def init_state(self):
        return dict(tail=np.zeros((self.max_delay,), self.dtype),
                    prev_delay=np.int32(self.delay0))

    def init_params(self):
        return dict(delay=np.int32(self.delay0))

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        d = jnp.clip(params["delay"], 0, self.max_delay)
        frame = jnp.concatenate([state["tail"], x.data])
        start = jnp.int32(self.max_delay) - d
        y = jax.lax.dynamic_slice_in_dim(frame, start, n)
        # zero-fill the freshly-exposed span when delay increased
        grew = jnp.maximum(d - state["prev_delay"], 0)
        mask = jnp.arange(n, dtype=jnp.int32) < grew
        y = jnp.where(mask, jnp.zeros((), y.dtype), y)
        new_state = dict(tail=frame[-self.max_delay:], prev_delay=d)
        return new_state, (x.like(y, count=x.count),)


# ---------------------------------------------------------------------------
# keep_one_in_n (baz_keep_one_in_n)
# ---------------------------------------------------------------------------

class KeepOneInN(Block):
    """Keep one sample in every n, phase-coherent across blocks
    (/root/reference/lib/baz_keep_one_in_n.cc:74-99 — the point of the
    baz version is surviving very large n; here n is limited only by the
    int32 counter)."""

    def __init__(self, n: int, block_size: int, dtype=jnp.complex64, name=None):
        super().__init__(name)
        self.n = int(n)
        self.block_size = int(block_size)
        self.capacity = block_size // self.n + 1
        self.dtype = dtype

    def init_state(self):
        # phase = index (within current block) of the next kept sample
        return dict(phase=np.int32(self.n - 1))

    def apply(self, state, params, x: Stream):
        nb = x.data.shape[0]
        k = jnp.arange(self.capacity + 1, dtype=jnp.int32)
        idx = state["phase"] + k * self.n  # one extra for next-phase lookup
        valid = idx[: self.capacity] < jnp.minimum(x.count, nb)
        y = x.data[jnp.clip(idx[: self.capacity], 0, nb - 1)]
        y = jnp.where(valid if y.ndim == 1 else valid[:, None],
                      y, jnp.zeros((), y.dtype))
        n_out = jnp.sum(valid.astype(jnp.int32))
        new_phase = idx[n_out] - nb
        out = x.like(y, count=n_out, rate_scale=1.0 / self.n)
        return dict(phase=new_phase), (out,)


# ---------------------------------------------------------------------------
# bit (un)packing (baz_unpacked_to_packed_bb)
# ---------------------------------------------------------------------------

class UnpackedToPacked(Block):
    """Pack bit-bytes (0/1) into bytes, MSB- or LSB-first
    (/root/reference/lib/baz_unpacked_to_packed_bb.cc:48-55)."""

    def __init__(self, msb_first: bool = True, name=None):
        super().__init__(name)
        if msb_first:
            w = 2 ** np.arange(7, -1, -1)
        else:
            w = 2 ** np.arange(8)
        self.weights = np.asarray(w, np.int32)

    def apply(self, state, params, x: Stream):
        n = x.data.shape[0]
        assert n % 8 == 0, "block size must be a multiple of 8"
        bits = (x.data.astype(jnp.int32) & 1).reshape(-1, 8)
        packed = jnp.sum(bits * self.weights, axis=1).astype(jnp.uint8)
        out = x.like(packed, count=x.count // 8, rate_scale=1.0 / 8)
        return state, (out,)


class PackedToUnpacked(Block):
    """Unpack bytes into bit-bytes (0/1), MSB- or LSB-first."""

    def __init__(self, msb_first: bool = True, name=None):
        super().__init__(name)
        if msb_first:
            s = np.arange(7, -1, -1)
        else:
            s = np.arange(8)
        self.shifts = np.asarray(s, np.int32)

    def apply(self, state, params, x: Stream):
        b = x.data.astype(jnp.int32)[:, None]
        bits = ((b >> self.shifts[None, :]) & 1).reshape(-1).astype(jnp.uint8)
        out = x.like(bits, count=x.count * 8, rate_scale=8.0)
        return state, (out,)


class Hysteresis(Block):
    """Two-threshold comparator with memory (gr threshold_ff equivalent —
    the reference tutorial's hysteresis demo, samples/tutorial/part-02).

    Output is 1 once the input rises to >= ``high``, 0 once it falls to
    <= ``low``, and HOLDS between the thresholds. Vectorized: each
    sample takes the value of the most recent decisive sample
    (cummax over decisive indices + gather), with the carried state
    covering a block with no crossings at its head.
    """

    def __init__(self, low: float, high: float, initial: float = 0.0,
                 name=None):
        super().__init__(name)
        if high < low:
            raise ValueError("high must be >= low")
        self.low0 = float(low)
        self.high0 = float(high)
        self.initial = np.float32(1.0 if initial >= high else 0.0)

    def init_state(self):
        return dict(prev=self.initial)

    def init_params(self):
        return dict(low=np.float32(self.low0), high=np.float32(self.high0))

    def apply(self, state, params, x: Stream):
        xd = x.data.astype(jnp.float32)
        n = xd.shape[0]
        hi = xd >= params["high"]
        lo = xd <= params["low"]
        decisive = (hi | lo) & x.valid_mask()
        idx = jnp.arange(n, dtype=jnp.int32)
        last = jax.lax.associative_scan(jnp.maximum,
                                        jnp.where(decisive, idx, -1))
        val = hi.astype(jnp.float32)
        y = jnp.where(last >= 0, val[jnp.clip(last, 0, n - 1)],
                      state["prev"])
        iend = jnp.clip(x.count - 1, 0, n - 1)
        new_prev = jnp.where(x.count > 0, y[iend], state["prev"])
        return dict(prev=new_prev), (x.like(y, count=x.count),)
