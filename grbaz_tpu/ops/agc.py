"""AGC — single-pole envelope tracker as an associative scan.

Behavior parity with ``baz_agc_cc``
(/root/reference/lib/baz_agc_cc.cc:64-100):

    env_0 = |x_0|                       (first sample ever)
    env_k = env_{k-1}*(1-rate) + |x_k|*rate
    gain_k = reference / env_k
    out_k  = x_k * gain_k

plus optional envelope and gain outputs (the reference's extra float
output ports).

TPU-first formulation: the recurrence is affine
(``env' = a*env + b``), so instead of a serial per-sample loop it runs
as a ``jax.lax.associative_scan`` over (a, b) pairs — O(N) work, O(log N)
depth, fully vectorized on the VPU. The carried state (env, started) is
one scalar pair, so blocks chain bit-consistently with a serial run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.iir import onepole_scan, state_at_count


def _affine_combine(p, q):
    """Compose affine maps: apply p then q. (a, b): env -> a*env + b."""
    pa, pb = p
    qa, qb = q
    return pa * qa, pb * qa + qb


def agc_block(x: jax.Array, env0: jax.Array, started: jax.Array,
              rate: jax.Array, reference: jax.Array, valid_mask=None):
    """Run the AGC over one block.

    Returns (y, env[N], gain[N], env_last, started'). ``valid_mask``
    (bool [N], a contiguous valid prefix) keeps masked samples from
    polluting the envelope state.

    Constant-pole formulation (ops.iir): the recurrence runs unmasked as
    triangular matmuls — causality keeps the valid prefix exact — and
    the invalid tail is overwritten with the last valid envelope
    (identical to the old masked scan's identity-op semantics). The
    first-sample-ever case (env := mag directly, reference _count==0
    path at baz_agc_cc.cc:64-100) folds into the constant-pole form by
    zeroing the incoming state and overriding b[0] with mag[0].
    """
    mag = jnp.abs(x).astype(jnp.float32)
    b = mag * rate
    b = b.at[0].set(jnp.where(started, b[0], mag[0]))
    y0 = jnp.where(started, env0, jnp.float32(0.0))
    env_raw = onepole_scan(b, 1.0 - rate, y0)
    if valid_mask is not None:
        count = jnp.sum(valid_mask.astype(jnp.int32))
        env_last = state_at_count(env_raw, count, env0)
        env = jnp.where(valid_mask, env_raw, env_last)
        any_valid = jnp.any(valid_mask)
    else:
        env, env_last, any_valid = env_raw, env_raw[-1], jnp.bool_(True)
    gain = reference / env
    y = (x * gain.astype(x.dtype)) if not jnp.iscomplexobj(x) else x * gain
    return y, env, gain, env_last, jnp.logical_or(started, any_valid)


class AGC(Block):
    """Streaming AGC block: in (c64 or f32) -> (out, envelope, gain)."""

    n_in = 1
    n_out = 3

    def __init__(self, rate: float = 1e-4, reference: float = 1.0,
                 gain: float = 1.0, max_gain: float = 0.0, name=None):
        super().__init__(name)
        self.rate0 = float(rate)
        self.reference0 = float(reference)
        # gain/max_gain accepted for API parity; the reference recomputes
        # gain from the envelope each sample (baz_agc_cc.cc:89), so the
        # initial gain is unused after sample 0 and max_gain is dead code
        # behind an early `continue` (baz_agc_cc.cc:103).

    def init_state(self):
        return dict(env=np.float32(1.0), started=np.bool_(False))

    def init_params(self):
        return dict(rate=np.float32(self.rate0),
                    reference=np.float32(self.reference0))

    def apply(self, state, params, x: Stream):
        y, env, gain, env_last, started = agc_block(
            x.data, state["env"], state["started"],
            params["rate"], params["reference"], valid_mask=x.valid_mask())
        new_state = dict(env=env_last, started=started)
        return new_state, (x.like(y, count=x.count),
                           x.like(env, count=x.count),
                           x.like(gain, count=x.count))
