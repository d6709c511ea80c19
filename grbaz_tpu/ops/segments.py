"""Block-parallel segment machinery for threshold/burst FSMs.

The reference's detector blocks (gate, peak detector, radar detector,
burst buffer — /root/reference/lib/baz_gate.cc,
lib/baz_peak_detector.cc, lib/baz_radar_detector.cc) are per-sample
``work()`` loops. A literal translation (``lax.scan`` over samples)
measured 0.08–0.13 Msamp/s on a v5e — far below the full-IQ-rate paths
these blocks sit in (burst extraction, spectral config 3). The
TPU-native formulation decomposes each FSM into:

  1. a *mask* computation (threshold compares — elementwise),
  2. *segment structure* (rising/falling edges; the position of the
     most recent edge via a running max — ``lax.cummax``),
  3. *per-segment reductions* (max / argmax / sum over each segment
     prefix) via a segmented ``lax.associative_scan`` — O(log n) depth,
     no per-sample sequential chain, and **cap-free**: correctness does
     not depend on an event-table capacity,
  4. per-event emission at segment boundaries (vectorized gathers and
     scatters).

Only the fixed-capacity *event list* output retains a cap (same
``_event_pack`` semantics as before: the count clamps and only an
overflowing block's final slot is unreliable).

Carried state across blocks seeds the running maxima (the open
segment's start) and combines into segment 0's reductions, so bursts
spanning block boundaries are exact — property-tested bit-for-bit
against per-sample serial mirrors in tests/test_detect.py and
tests/test_burst.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sentinel "no position yet" for running-maximum position tracking;
# INT32_MIN/2 keeps +offset arithmetic overflow-free
NO_POS = -(2 ** 30)


def running_last_true(mask: jax.Array, idx: jax.Array, seed) -> jax.Array:
    """Position of the most recent True at or before each sample.

    ``idx`` supplies the position value recorded where ``mask`` is set
    (typically a global sample index); ``seed`` is the carried position
    from previous blocks (use NO_POS for "none"). Exact for any number
    of events — no capacity table.
    """
    v = jnp.where(mask, idx, jnp.int32(NO_POS))
    return jnp.maximum(jax.lax.cummax(v), jnp.asarray(seed, jnp.int32))


def seg_prefix_sum(reset: jax.Array, values: jax.Array) -> jax.Array:
    """Segmented inclusive prefix sum: out[i] = sum of ``values`` from
    the most recent ``reset`` flag at or before i, through i.

    Direct per-segment accumulation — no block-wide cumsum differencing,
    so short segments late in a large block keep full f32 precision
    (advisor r4 on the earlier csum0-difference formulation).
    """

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)

    _, s = jax.lax.associative_scan(
        comb, (reset, values.astype(jnp.float32)))
    return s


def seg_prefix_max(reset: jax.Array, values: jax.Array) -> jax.Array:
    """Segmented inclusive prefix max (no position tracking)."""

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    _, mv = jax.lax.associative_scan(comb, (reset, values))
    return mv


def seg_prefix_maxpos(reset: jax.Array, values: jax.Array,
                      positions: jax.Array) -> tuple:
    """Segmented inclusive prefix max with the position of its *first*
    occurrence (ties keep the earlier position — the reference FSMs
    update their peak only on strictly-greater samples)."""

    def comb(a, b):
        fa, va, pa = a
        fb, vb, pb = b
        take_b = fb | (vb > va)
        return (fa | fb, jnp.where(take_b, vb, va),
                jnp.where(take_b, pb, pa))

    _, mv, mp = jax.lax.associative_scan(
        comb, (reset, values, positions.astype(jnp.int32)))
    return mv, mp


def next_true_index(mask: jax.Array, fill: int) -> jax.Array:
    """Index of the first True at or after each sample (``fill`` when
    none remain) — a reverse running minimum. Used by the event-level
    scans (non-retriggerable gate, burst buffer) to jump between
    trigger edges in O(events) instead of O(samples)."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    v = jnp.where(mask, idx, jnp.int32(fill))
    return jax.lax.cummin(v, reverse=True)
