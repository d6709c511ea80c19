"""Exact long-stream phase / position arithmetic in 32-bit integers.

The reference keeps numerical integrity on infinite streams with x87
``long double`` accumulators (``d_mu += d_mu_inc``,
/root/reference/lib/baz_fractional_resampler_cc.cc:154-196) and a
parts-per-billion rational ratio interface (:115-141). TPUs have no fast
f64, so this module provides drop-in exact alternatives built entirely
on 32-bit integer modular arithmetic, which XLA executes natively:

* **Turn phase** (for oscillators/rotators): phase is a uint32 in units
  of 2^-32 turns. ``k * inc`` with uint32 wraparound is *exactly*
  ``(k * inc) mod 2^32`` — unbounded streams never lose phase coherence.

* **Fixed-point stream positions** (for resamplers): position
  ``p_k = mu0 + k * inc`` where ``inc = inc_int + inc_frac * 2^-32``
  samples. The fractional part is an exact uint32 modular ramp; the
  carry (integer wraps) is recovered exactly by counting modular
  wrap-downs with a cumulative sum — no 64-bit multiply needed.

Resolution: 2^-32 of a sample period ≈ 0.23 ppb — finer than the
reference's ppb message interface.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TWO32 = float(2 ** 32)
_TWO_PI = float(2.0 * np.pi)


# ---------------------------------------------------------------------------
# host-side converters (exact, double/int precision on the host)
# ---------------------------------------------------------------------------

def freq_to_turns_u32(freq_hz: float, sample_rate: float) -> np.uint32:
    """Frequency -> uint32 phase increment in 2^-32 turns per sample."""
    turns = float(freq_hz) / float(sample_rate)
    inc = int(round((turns % 1.0) * TWO32)) % (2 ** 32)
    return np.uint32(inc)


def ratio_to_fixed(ratio: float) -> Tuple[np.int32, np.uint32]:
    """Resampling ratio (input samples per output) -> (int, 2^-32 frac)."""
    if ratio <= 0:
        raise ValueError("resampling ratio must be > 0")
    ip = int(np.floor(ratio))
    frac = int(round((float(ratio) - ip) * TWO32))
    if frac >= 2 ** 32:  # rounded up to next integer
        ip, frac = ip + 1, 0
    return np.int32(ip), np.uint32(frac)


def ppb_to_fixed(int_part: int, frac_ppb: float) -> Tuple[np.int32, np.uint32]:
    """The reference's ppb ratio message ``(i + frac)/1e9``
    (/root/reference/lib/baz_fractional_resampler_cc.cc:115-141) -> fixed."""
    return ratio_to_fixed((float(int_part) + float(frac_ppb)) / 1e9)


def fixed_to_ratio(ip, frac) -> float:
    return float(int(ip)) + float(int(np.uint32(frac))) / TWO32


# ---------------------------------------------------------------------------
# device-side exact ramps
# ---------------------------------------------------------------------------

def phase_ramp_u32(n: int, phase0: jax.Array, inc: jax.Array) -> jax.Array:
    """Exact modular phase ramp: ``(phase0 + k*inc) mod 2^32``, k in [0, n).

    ``phase0``/``inc`` are uint32 scalars (2^-32 turn units). uint32
    multiply/add wrap mod 2^32 in XLA, so this is exact for any stream
    length — the rotator never drifts.
    """
    k = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).squeeze(-1)
    return phase0.astype(jnp.uint32) + k * inc.astype(jnp.uint32)


def turns_u32_to_radians(phase_u32: jax.Array) -> jax.Array:
    """uint32 turn phase -> float32 radians in [0, 2pi)."""
    return phase_u32.astype(jnp.float32) * jnp.float32(_TWO_PI / TWO32)


def oscillator(n: int, phase0: jax.Array, inc: jax.Array,
               conj: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Complex exponential block exp(+/- j*2pi*phase), plus next phase0.

    Returns ``(lo[n] complex64, phase_after uint32)``.

    Note (r4, measured): a stride-16 outer-product factorization that
    cuts the trig count 16x made the WBFM chain 36% SLOWER on v5e
    (1044 vs 1637 Msamp/s) — the direct per-sample cos/sin fuses into
    the consuming multiply, while the factored form materializes the
    [N/16, 16] complex intermediate. Transcendental COUNT is not the
    cost; fusion is. Keep the direct form.
    """
    ph = phase_ramp_u32(n, phase0, inc)
    ang = turns_u32_to_radians(ph)
    if conj:
        ang = -ang
    lo = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    phase_after = phase0.astype(jnp.uint32) + jnp.uint32(n) * inc.astype(jnp.uint32)
    return lo, phase_after


def fixed_positions(n: int, mu_frac0: jax.Array, inc_int: jax.Array,
                    inc_frac: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact positions ``p_k = mu0 + k*inc`` in sample fixed point.

    Args:
      n: number of positions (static).
      mu_frac0: uint32 scalar — fractional start position (2^-32 samples).
        The integer start position is by convention 0.
      inc_int / inc_frac: int32 / uint32 scalars — the increment.

    Returns:
      ``(idx int32 [n], frac uint32 [n])`` with
      ``p_k = idx_k + frac_k * 2^-32`` exactly.

    The fractional ramp is modular (exact); integer carries are the count
    of wrap-downs in the ramp, recovered with a cumsum — exact because at
    most one wrap can occur per step (inc_frac < 2^32).
    """
    k = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).squeeze(-1)
    mu0 = mu_frac0.astype(jnp.uint32)
    incf = inc_frac.astype(jnp.uint32)
    frac = mu0 + k * incf
    if n <= (1 << 16):
        # closed-form carries: carries_k = (mu0 + k*inc_frac) >> 32,
        # computed with 16-bit limb splits so every product fits in
        # uint32 (k < 2^16). Exact — and removes the 1-D cumsum, which
        # lowers to lane-strided log-depth passes on TPU.
        hi = incf >> jnp.uint32(16)
        lo = incf & jnp.uint32(0xFFFF)
        s = k * hi                      # < 2^32 (fits uint32; k, hi < 2^16)
        t_low = k * lo + mu0            # mod 2^32
        t_carry = (t_low < mu0).astype(jnp.uint32)
        l2 = (s << jnp.uint32(16)) + t_low     # mod 2^32
        c2 = (l2 < t_low).astype(jnp.uint32)
        carries = ((s >> jnp.uint32(16)) + t_carry + c2).astype(jnp.int32)
    else:
        wrap = (frac[1:] < frac[:-1]).astype(jnp.int32)
        carries = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(wrap)])
    idx = k.astype(jnp.int32) * inc_int.astype(jnp.int32) + carries
    return idx, frac


def frac_to_phase_bin(frac: jax.Array, nsteps_log2: int = 7) -> jax.Array:
    """Round a uint32 fractional position to an interpolator phase bin.

    Returns int32 bins in [0, 2**nsteps_log2] inclusive (the top bin is
    the next-sample filter, mirroring rint(mu*NSTEPS) in the reference's
    interpolate call). Overflow-safe: works on frac>>1 so the rounding
    add cannot wrap.
    """
    shift = 32 - nsteps_log2 - 1  # apply to frac>>1
    half = jnp.uint32(1 << (shift - 1))
    return (((frac >> 1) + half) >> shift).astype(jnp.int32)
