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

# ---------------------------------------------------------------------------
# Two-level blocked scans.
#
# jax.lax.cummax / associative_scan on a 1-D [n] array lower to log2(n)
# rounds of LANE-STRIDED slice/concat on TPU — measured ~13 ms for the
# segmented machinery on a 1M block (the whole Gate ran 82 Msamp/s,
# bound entirely by this). The blocked form reshapes to [n/128, 128],
# runs log2(128)=7 lane-shift rounds for the within-row scan, a tiny
# [n/128] row-level scan for the carries, and one broadcast combine —
# the log-depth passes act on 2-D tiles the vector unit shifts
# natively. Exactness is unchanged (same associative combines, same
# order); property-tested against the 1-D forms and the per-sample
# serial mirrors.
# ---------------------------------------------------------------------------

_L = 128


def _pad2d(v: jax.Array, fill):
    n = v.shape[0]
    c = -(-n // _L)
    pad = c * _L - n
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])
    return v.reshape(c, _L), n


def _lane_shift(x: jax.Array, s: int, fill):
    return jnp.concatenate(
        [jnp.full((x.shape[0], s), fill, x.dtype), x[:, :-s]], axis=1)


def _cummax_blocked(v: jax.Array, fill) -> jax.Array:
    x2, n = _pad2d(v, fill)
    r = x2
    s = 1
    while s < _L:
        r = jnp.maximum(r, _lane_shift(r, s, fill))
        s <<= 1
    car = jax.lax.cummax(r[:, -1])
    car_ex = jnp.concatenate([jnp.full((1,), fill, v.dtype), car[:-1]])
    return jnp.maximum(r, car_ex[:, None]).reshape(-1)[:n]


def running_last_true(mask: jax.Array, idx: jax.Array, seed) -> jax.Array:
    """Position of the most recent True at or before each sample.

    ``idx`` supplies the position value recorded where ``mask`` is set
    (typically a global sample index); ``seed`` is the carried position
    from previous blocks (use NO_POS for "none"). Exact for any number
    of events — no capacity table.
    """
    v = jnp.where(mask, idx.astype(jnp.int32), jnp.int32(NO_POS))
    return jnp.maximum(_cummax_blocked(v, jnp.int32(NO_POS)),
                       jnp.asarray(seed, jnp.int32))


def _seg_blocked(reset: jax.Array, leaves: tuple, op, units) -> tuple:
    """Blocked segmented inclusive scan over tuple-valued elements.

    ``op((a...), (b...))`` combines an EARLIER accumulation a into b's;
    ``units`` are op's identities (shifted in at row starts, absorbed
    harmlessly). Returns the scanned leaves; segments reset at
    ``reset`` flags (the flagged element starts a fresh segment).
    """
    f2, n = _pad2d(reset, False)
    vs2 = [_pad2d(v, u)[0] for v, u in zip(leaves, units)]
    f = f2
    s = 1
    while s < _L:
        fs = _lane_shift(f, s, False)
        shifted = [_lane_shift(v, s, u) for v, u in zip(vs2, units)]
        combined = op(shifted, vs2)
        vs2 = [jnp.where(f, v, c) for v, c in zip(vs2, combined)]
        f = f | fs
        s <<= 1
    # row-level segmented carry: row c's tail accumulation feeds row
    # c+1 unless a flag occurred in it
    row_f = f[:, -1]
    row_tail = [v[:, -1] for v in vs2]

    def comb(a, b):
        fa, va = a[0], a[1:]
        fb, vb = b[0], b[1:]
        c = op(va, vb)
        return (fa | fb,) + tuple(jnp.where(fb, x, y)
                                  for x, y in zip(vb, c))

    scanned = jax.lax.associative_scan(comb, (row_f,) + tuple(row_tail))
    carry = [jnp.concatenate([jnp.full((1,), u, v.dtype), v[:-1]])
             for v, u in zip(scanned[1:], units)]
    with_carry = op([c[:, None] for c in carry], vs2)
    out = [jnp.where(f, v, w) for v, w in zip(vs2, with_carry)]
    return tuple(o.reshape(-1)[:n] for o in out)


def seg_prefix_sum(reset: jax.Array, values: jax.Array) -> jax.Array:
    """Segmented inclusive prefix sum: out[i] = sum of ``values`` from
    the most recent ``reset`` flag at or before i, through i.

    Direct per-segment accumulation — no block-wide cumsum differencing,
    so short segments late in a large block keep full f32 precision
    (advisor r4 on the earlier csum0-difference formulation).
    """

    def op(a, b):
        return (a[0] + b[0],)

    (s,) = _seg_blocked(reset, (values.astype(jnp.float32),), op,
                        (jnp.float32(0.0),))
    return s


def seg_prefix_max(reset: jax.Array, values: jax.Array) -> jax.Array:
    """Segmented inclusive prefix max (no position tracking)."""

    def op(a, b):
        return (jnp.maximum(a[0], b[0]),)

    unit = jnp.asarray(-jnp.inf, values.dtype) \
        if jnp.issubdtype(values.dtype, jnp.floating) \
        else jnp.asarray(NO_POS, values.dtype)
    (m,) = _seg_blocked(reset, (values,), op, (unit,))
    return m


def seg_prefix_maxpos(reset: jax.Array, values: jax.Array,
                      positions: jax.Array) -> tuple:
    """Segmented inclusive prefix max with the position of its *first*
    occurrence (ties keep the earlier position — the reference FSMs
    update their peak only on strictly-greater samples)."""

    def op(a, b):
        va, pa = a
        vb, pb = b
        take_b = vb > va
        return (jnp.where(take_b, vb, va), jnp.where(take_b, pb, pa))

    unit_v = jnp.asarray(-jnp.inf, values.dtype) \
        if jnp.issubdtype(values.dtype, jnp.floating) \
        else jnp.asarray(NO_POS, values.dtype)
    mv, mp = _seg_blocked(reset, (values, positions.astype(jnp.int32)),
                          op, (unit_v, jnp.int32(NO_POS)))
    return mv, mp


def next_true_index(mask: jax.Array, fill: int) -> jax.Array:
    """Index of the first True at or after each sample (``fill`` when
    none remain) — a reverse running minimum. Used by the event-level
    scans (non-retriggerable gate, burst buffer) to jump between
    trigger edges in O(events) instead of O(samples)."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    v = jnp.where(mask, idx, jnp.int32(fill))
    # reverse running min == negated forward running max on the
    # reversed array (blocked form)
    r = _cummax_blocked(-v[::-1], jnp.int32(-(2 ** 31) + 1))
    return -r[::-1]
