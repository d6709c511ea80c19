"""Streaming pump: the async host pipeline around a StreamExecutor.

SURVEY §7 hard-part #5: host<->device streaming needs pinned-buffer
double buffering, async dispatch, and explicit back-pressure semantics
replacing GNU Radio's blocking circular buffers (with non_blocker-style
zero-fill as the degradation mode — lib/baz_non_blocker.cc:87-131).

:class:`StreamPump` runs two threads around a bounded block queue (the
double buffer):

* the **feeder** pulls blocks from the source callable into the queue.
  A full queue applies back-pressure (blocking mode) or drops-oldest
  with an overrun counter (``drop=True`` — the real-time mode);
* the **runner** steps the executor — keeping up to ``inflight``
  asynchronously-dispatched steps pending so host transfers overlap
  device compute (executor.dispatch/fetch) — and hands each named
  output ``(data, count)`` to its sink callback.

A source returning ``None`` means "no data yet": with
``zero_fill=True`` the pump feeds a zero block (underrun counter++) so
downstream sinks never stall — the non_blocker semantic; otherwise the
feeder retries.

Counters (blocks_in/out, underruns, overruns) mirror the reference's
RTL-source observability (lib/baz_rtl_source_c.h:148-167).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Dict, Optional

import numpy as np


class StreamPump:
    def __init__(self, executor, source: Callable[[], Optional[dict]],
                 sinks: Dict[str, Callable], depth: int = 2,
                 drop: bool = False, zero_fill: bool = False,
                 poll_interval: float = 0.002, inflight: int = 3):
        self.ex = executor
        self.source = source
        self.sinks = dict(sinks)
        self.depth = max(1, int(depth))
        self.inflight = max(1, int(inflight))
        self.drop = bool(drop)
        self.zero_fill = bool(zero_fill)
        self.poll = float(poll_interval)
        self._q: queue.Queue = queue.Queue(maxsize=self.depth)
        self._run = False
        self._feeder: Optional[threading.Thread] = None
        self._runner: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        self.blocks_in = 0
        self.blocks_out = 0
        self.underruns = 0
        self.overruns = 0
        self._zero_block = {
            name: np.zeros(spec.shape, spec.dtype)
            for name, spec in executor.inputs.items()
        } if zero_fill else None

    # -- lifecycle -------------------------------------------------------------
    def start(self):
        if self._run:
            return
        self._run = True
        self._feeder = threading.Thread(target=self._feed_loop, daemon=True)
        self._runner = threading.Thread(target=self._run_loop, daemon=True)
        self._feeder.start()
        self._runner.start()

    def stop(self, timeout: float = 5.0):
        self._run = False
        for t in (self._feeder, self._runner):
            if t is not None:
                t.join(timeout=timeout)
        self._feeder = self._runner = None

    def stats(self) -> dict:
        with self._lock:
            return dict(blocks_in=self.blocks_in, blocks_out=self.blocks_out,
                        underruns=self.underruns, overruns=self.overruns,
                        queued=self._q.qsize())

    # -- threads ----------------------------------------------------------------
    def _feed_loop(self):
        while self._run:
            try:
                blk = self.source()
            except Exception:
                blk = None
            if blk is None:
                if self.zero_fill:
                    blk = self._zero_block
                    with self._lock:
                        self.underruns += 1
                else:
                    time.sleep(self.poll)
                    continue
            if self.drop:
                while True:
                    try:
                        self._q.put_nowait(blk)
                        break
                    except queue.Full:
                        try:  # drop oldest: real-time mode
                            self._q.get_nowait()
                            with self._lock:
                                self.overruns += 1
                        except queue.Empty:
                            pass
            else:
                while self._run:  # back-pressure: block until space
                    try:
                        self._q.put(blk, timeout=self.poll)
                        break
                    except queue.Full:
                        continue
            with self._lock:
                self.blocks_in += 1

    def _deliver(self, pending):
        outs = self.ex.fetch(pending)
        for name, sink in self.sinks.items():
            if name in outs:
                data, count = outs[name]
                sink(data, count)
        with self._lock:
            self.blocks_out += 1

    def _run_loop(self):
        # Pipelined stepping: keep up to `inflight` dispatched steps
        # pending before fetching the oldest, so the host upload of
        # block i+1..i+k overlaps the device compute and result
        # download of block i. With a transfer RTT of R and a step
        # compute of C, a depth-k pipeline sustains ~1/max(C, R/k)
        # blocks/s instead of 1/(R + C) — this is what closes the gap
        # to the measured attachment ceiling (BENCH r4: 0.72 of a 1.05
        # Msamp/s ceiling at inflight=1).
        from collections import deque
        pend = deque()
        while self._run:
            while len(pend) < self.inflight:
                try:
                    blk = self._q.get_nowait()
                except queue.Empty:
                    break
                pend.append(self.ex.dispatch(blk))
            if pend:
                self._deliver(pend.popleft())
            else:
                try:
                    blk = self._q.get(timeout=self.poll)
                except queue.Empty:
                    continue
                pend.append(self.ex.dispatch(blk))
        while pend:  # drain in-flight work on stop
            self._deliver(pend.popleft())
