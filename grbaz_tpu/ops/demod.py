"""Demodulation kernels: FM quadrature demod, power squelch, deemphasis.

These are the stock-GNU-Radio halves of the reference's flagship WBFM
chain (samples/RTL-FM.grc: freq_xlating_fir -> pwr_squelch ->
quadrature_demod -> resampler -> audio; SURVEY.md §3.1). The reference
relies on the host runtime for them; this framework supplies its own.

All are block-vectorized: the only carried state is a scalar (previous
sample / envelope), and first-order IIR recurrences run as associative
scans (see ops.agc).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.iir import onepole_scan, state_at_count


# ---------------------------------------------------------------------------
# FM quadrature demod
# ---------------------------------------------------------------------------

def quadrature_demod(x: jax.Array, prev: jax.Array, gain) -> tuple:
    """y[n] = gain * arg(x[n] * conj(x[n-1])); returns (y, last_sample)."""
    shifted = jnp.concatenate([prev[None], x[:-1]])
    prod = x * jnp.conj(shifted)
    y = jnp.arctan2(prod.imag, prod.real).astype(jnp.float32) * gain
    return y, x[-1]


class QuadratureDemod(Block):
    """FM discriminator. ``gain`` is typically fs/(2*pi*max_deviation)."""

    def __init__(self, gain: float, name=None):
        super().__init__(name)
        self.gain0 = float(gain)

    def init_state(self):
        return dict(prev=np.complex64(1.0 + 0.0j))

    def init_params(self):
        return dict(gain=np.float32(self.gain0))

    def apply(self, state, params, x: Stream):
        y, last = quadrature_demod(x.data, state["prev"], params["gain"])
        # Keep state coherent across partial blocks: hold prev if no valid data.
        n = x.data.shape[0]
        idx = jnp.clip(x.count - 1, 0, n - 1)
        last = jnp.where(x.count > 0, x.data[idx], state["prev"])
        return dict(prev=last), (x.like(y, count=x.count),)


# ---------------------------------------------------------------------------
# Power squelch
# ---------------------------------------------------------------------------

class PowerSquelch(Block):
    """Single-pole smoothed-power squelch (gr pwr_squelch equivalent).

    avg[n] = avg[n-1]*(1-alpha) + |x[n]|^2 * alpha; output is x where
    avg >= threshold else 0. (Gate, not ramped — the reference chain uses
    it to mute inter-station noise.)
    """

    def __init__(self, threshold_db: float, alpha: float = 1e-4, name=None):
        super().__init__(name)
        self.threshold0 = 10.0 ** (float(threshold_db) / 10.0)
        self.alpha0 = float(alpha)

    def init_state(self):
        return dict(avg=np.float32(0.0))

    def init_params(self):
        return dict(threshold=np.float32(self.threshold0),
                    alpha=np.float32(self.alpha0))

    def apply(self, state, params, x: Stream):
        p = (x.data.real * x.data.real + x.data.imag * x.data.imag) \
            if jnp.iscomplexobj(x.data) else x.data * x.data
        alpha = params["alpha"]
        # Constant-pole recurrence as triangular matmuls (ops.iir); the
        # stream's validity is a contiguous prefix, so the carried state
        # is the value at count-1 and the invalid tail is overwritten
        # with it (the identity-op semantics of the old per-sample
        # masked scan, without the masking).
        avg_raw = onepole_scan(p.astype(jnp.float32) * alpha,
                               1.0 - alpha, state["avg"])
        avg_last = state_at_count(avg_raw, x.count, state["avg"])
        avg = jnp.where(x.valid_mask(), avg_raw, avg_last)
        gate = avg >= params["threshold"]
        y = jnp.where(gate, x.data, jnp.zeros((), x.data.dtype))
        return dict(avg=avg_last), (x.like(y, count=x.count),)


# ---------------------------------------------------------------------------
# FM deemphasis (single-pole IIR)
# ---------------------------------------------------------------------------

class FMDeemphasis(Block):
    """Single-pole IIR deemphasis: y[n] = b*x[n] + a*y[n-1].

    Bilinear-transformed RC network with time constant ``tau`` at
    ``sample_rate`` (75 us US / 50 us EU).
    """

    def __init__(self, sample_rate: float, tau: float = 75e-6, name=None):
        super().__init__(name)
        # Bilinear transform of H(s) = 1/(1 + s*tau)
        w_c = 1.0 / tau
        w_ca = 2.0 * sample_rate * math.tan(w_c / (2.0 * sample_rate))
        k = -w_ca / (2.0 * sample_rate)
        z1 = -1.0
        p1 = (1.0 + k) / (1.0 - k)
        b0 = -k / (1.0 - k)
        self.b = [b0, -z1 * b0]  # feedforward
        self.a = p1  # feedback pole

    def init_state(self):
        return dict(y_prev=np.float32(0.0), x_prev=np.float32(0.0))

    def apply(self, state, params, x: Stream):
        xd = x.data.astype(jnp.float32)
        x_sh = jnp.concatenate([jnp.asarray(state["x_prev"],
                                            jnp.float32)[None], xd[:-1]])
        ff = self.b[0] * xd + self.b[1] * x_sh
        # Constant-pole recurrence as triangular matmuls (ops.iir). The
        # stream's validity is a contiguous prefix and the recurrence is
        # causal, so the valid prefix of y is exact regardless of the
        # garbage drive past x.count; the carried state is y at count-1
        # and the invalid tail is overwritten with it (matching the old
        # masked scan's identity-op semantics).
        y_raw = onepole_scan(ff, self.a, state["y_prev"])
        y_last = state_at_count(y_raw, x.count, state["y_prev"])
        y = jnp.where(x.valid_mask(), y_raw, y_last)
        new_state = dict(
            y_prev=y_last,
            x_prev=state_at_count(xd, x.count, state["x_prev"]))
        return new_state, (x.like(y, count=x.count),)


# ---------------------------------------------------------------------------
# AM envelope demod
# ---------------------------------------------------------------------------

class AMDemod(Block):
    """AM envelope detector: |x| with carrier (DC) removal.

    The carrier level is tracked by a single-pole lowpass (associative
    scan) and subtracted, so the output is the modulation alone —
    the demod stage of the reference's AM receive app
    (/root/reference/apps/am_fft.py magnitude path).
    """

    def __init__(self, dc_alpha: float = 1e-3, gain: float = 1.0, name=None):
        super().__init__(name)
        self.alpha0 = float(dc_alpha)
        self.gain0 = float(gain)

    def init_state(self):
        return dict(dc=np.float32(0.0))

    def init_params(self):
        return dict(alpha=np.float32(self.alpha0),
                    gain=np.float32(self.gain0))

    def apply(self, state, params, x: Stream):
        env = jnp.abs(x.data).astype(jnp.float32)
        # Constant-pole recurrence as triangular matmuls (ops.iir);
        # count-prefix validity handled by causality + tail overwrite.
        dc_raw = onepole_scan(params["alpha"] * env, 1.0 - params["alpha"],
                              state["dc"])
        dc_last = state_at_count(dc_raw, x.count, state["dc"])
        dc = jnp.where(x.valid_mask(), dc_raw, dc_last)
        y = (env - dc) * params["gain"]
        return dict(dc=dc_last), (x.like(y, count=x.count),)
