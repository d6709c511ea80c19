"""In-graph event dispatch + future-sample-time mux.

TPU-native equivalents of the reference's native-callback machinery:

* :class:`NativeCallbackX` — baz_native_callback_x
  (/root/reference/lib/baz_native_callback.cc:106-132): scans a float
  stream for rising threshold crossings and "calls back" with
  ``(value, samples_processed)``. The reference dispatches a C++ virtual
  call per event so the hot path never touches Python; the TPU-native
  analog is stronger: events are emitted as a fixed-capacity *event
  stream* (a ``[E, 2]`` array of (relative sample index, value) rows
  plus a valid count) that downstream kernels consume **inside the same
  compiled XLA program** — zero host round-trips, and the whole
  detect→react path fuses. A host-dispatch helper is provided for the
  Python-visible path (message callbacks).
* :class:`NativeMux` — baz_native_mux
  (/root/reference/lib/baz_native_mux.cc:71-93,140-180): N→1 mux that
  switches to the alternate input at a *future* sample time
  (event time + fixed latency) and holds it for ``trigger_count``
  samples, optionally substituting values from a cycling table. The
  reference walks a ``d_switch_time`` deque per sample on the host
  thread; here the pending deadlines are a fixed-size sorted carry
  array and selection is a vectorized window test, so the per-sample
  loop disappears entirely.

Scheduling semantics preserved: deadline = event index + ``latency``;
at the deadline the mux selects input 1 and holds for ``trigger_count``
samples; stale deadlines are dropped; the substitution value index
advances once per activation (reference ``d_value_index`` cycling,
:140-146). One deliberate difference: the reference ``consume()``s only
the used items from secondary inputs; the block-synchronous executor
advances all inputs in lockstep (same block length), which is the
natural XLA formulation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream

# sentinel for "no pending deadline" — far beyond any real block length
_INF = np.int32(2 ** 30)


def threshold_events(x: jax.Array, level: jax.Array, prev_above: jax.Array,
                     max_events: int, *, enabled=True):
    """Rising-edge threshold crossings of ``x`` (vectorized).

    Mirrors the reference trigger logic (baz_native_callback.cc:115-123):
    an event fires when the stream rises to >= ``level`` having been
    below it; ``prev_above`` is the carried hysteresis flag from the
    previous block. When ``enabled`` is False every sample is an event
    (the reference's threshold_enable=false mode), capacity-bounded.

    Returns ``(times [E] int32, values [E] f32, n_events int32,
    prev_above')``. Slots past ``n_events`` hold ``_INF`` / 0.
    """
    n = x.shape[0]
    above = x >= level
    prev = jnp.concatenate([prev_above[None], above[:-1]])
    trig = jnp.where(enabled, above & ~prev, jnp.ones_like(above))
    idx = jnp.where(trig, jnp.arange(n, dtype=jnp.int32), _INF)
    times = jax.lax.sort(idx)[:max_events]
    valid = times < _INF
    values = jnp.where(valid, x[jnp.minimum(times, n - 1)], 0.0)
    n_events = jnp.sum(valid.astype(jnp.int32))
    return times, values.astype(jnp.float32), n_events, above[-1]


class NativeCallbackX(Block):
    """Threshold-crossing event emitter (baz_native_callback_x).

    Input: float stream. Output: event stream — data ``[E, 2]`` float32
    rows ``(relative sample index, value)`` with ``count`` = number of
    events this block. Feed it to :class:`NativeMux` (in-graph, the
    C++-to-C++ analog) or to :func:`dispatch_events` (host callbacks).
    """

    def __init__(self, threshold_enable: bool = False,
                 threshold_level: float = 0.0, max_events: int = 16,
                 name=None):
        super().__init__(name)
        self.max_events = int(max_events)
        self._enable0 = bool(threshold_enable)
        self._level0 = float(threshold_level)

    def init_state(self):
        return jnp.bool_(False)  # d_triggered hysteresis flag

    def init_params(self):
        return dict(threshold_enable=jnp.bool_(self._enable0),
                    threshold_level=jnp.float32(self._level0))

    def apply(self, state, params, x: Stream):
        times, values, n_events, above = threshold_events(
            x.data.astype(jnp.float32), params["threshold_level"], state,
            self.max_events, enabled=params["threshold_enable"])
        # mask events landing in the invalid tail of a short block
        live = times < x.count
        n_events = jnp.sum(live.astype(jnp.int32))
        times = jnp.where(live, times, _INF)
        ev = jnp.stack([times.astype(jnp.float32), values], axis=1)
        return above, (x.like(ev, count=n_events, rate_scale=0.0),)


def dispatch_events(target, events: np.ndarray, n_events: int,
                    abs_base: int = 0) -> int:
    """Host-side dispatch: invoke ``target.callback(value, abs_index)``
    per event — the reference's callback_target interface
    (baz_native_callback.h:50-54) for Python consumers."""
    n = int(n_events)
    for t, v in np.asarray(events)[:n]:
        target.callback(float(v), int(t) + int(abs_base))
    return n


class NativeMux(Block):
    """2→1 mux switching at scheduled future sample times (baz_native_mux).

    Inputs: ``(main, alt, events)`` where ``events`` is a
    :class:`NativeCallbackX` output. Each event schedules a switch at
    ``event_index + latency``; from the deadline the mux emits input 1
    for ``trigger_count`` samples, then falls back to input 0. If
    ``values`` is given, activated windows substitute values from the
    cycling table (reference d_values behavior, baz_native_mux.cc:66-68,
    162-167).

    Carry: up to ``pending`` deadlines (block-relative, re-based each
    block) + the substitution cycle offset. Deadlines beyond capacity
    are dropped oldest-last (the reference deque is unbounded; 16 is
    far above any realistic in-flight count at latency ≈ 133k samples).
    """

    n_in = 3

    def __init__(self, latency: int = 16384 * 8 + 2048,
                 trigger_count: int = 2048,
                 values: Optional[Sequence[float]] = None,
                 pending: int = 16, name=None):
        super().__init__(name)
        self.latency = int(latency)
        self.trigger_count = int(trigger_count)
        self.values = None if values is None else np.asarray(
            values, np.float32)
        self.pending = int(pending)

    def init_state(self):
        return (jnp.full((self.pending,), _INF, jnp.int32),  # deadlines
                jnp.int32(0))                                # value cycle

    def apply(self, state, params, main: Stream, alt: Stream,
              events: Stream):
        deadlines, voff = state
        n = main.capacity
        ev_times = events.data[:, 0].astype(jnp.int32)
        ev_valid = jnp.arange(ev_times.shape[0]) < events.count
        new_dl = jnp.where(ev_valid, ev_times + self.latency, _INF)
        allq = jax.lax.sort(jnp.concatenate([deadlines, new_dl]))
        q = allq[:self.pending]  # earliest-first; overflow drops latest
        t = jnp.arange(n, dtype=jnp.int32)[:, None]          # [N, 1]
        win = (t >= q[None, :]) & (t < q[None, :] + self.trigger_count)
        selected = jnp.any(win, axis=1)                      # [N]
        out = jnp.where(selected, alt.data, main.data)
        if self.values is not None:
            # substitution value per window: cycle offset + rank of the
            # deadline whose window covers the sample
            rank = jnp.argmax(win, axis=1).astype(jnp.int32)
            vidx = (voff + rank) % self.values.shape[0]
            sub = jnp.asarray(self.values)[vidx].astype(out.dtype)
            out = jnp.where(selected, sub, out)
        # retire windows fully inside this block; re-base the rest
        done = (q + self.trigger_count) <= n
        n_done = jnp.sum(done.astype(jnp.int32))
        q2 = jnp.where(q >= _INF, _INF,
                       jnp.maximum(q - n, -self.trigger_count))
        q2 = jnp.where(done, _INF, q2)
        new_state = (jax.lax.sort(q2), voff + n_done)
        return new_state, (main.like(out, count=main.count),)
