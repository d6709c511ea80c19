"""Streaming host executor — feeds a compiled flowgraph from host data.

The replacement for GNU Radio's ``top_block.run()`` + per-block threads:
one host loop, one jitted device program per step. The executor

* owns the **source metadata** (absolute sample counters, seq numbers,
  epoch — the ``rx_time`` machinery of SURVEY.md §3.3) as part of the
  carried device state, so stream time stays exact without host work;
* keeps all block states resident on device (donated buffers — zero
  copy between steps);
* launders every host<->device transfer through float32 views
  (``core.hostio``) because the target TPU attachment only implements
  f32 transfers; on full backends this is a passthrough;
* accepts partial final blocks via per-port valid counts.

Block states never cross the host boundary: they are *created on
device* by a jitted literal-init program (init states are numpy
constants embedded in the executable), and stay there.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grbaz_tpu.core import hostio
from grbaz_tpu.core.graph import Flowgraph
from grbaz_tpu.core.stream import Stream, StreamMeta


@dataclasses.dataclass(frozen=True)
class InputSpec:
    """Static description of an executor input port."""
    shape: Tuple[int, ...]
    dtype: str
    sample_rate: float = 1.0


class StreamExecutor:
    """Host-side streaming driver for a Flowgraph."""

    def __init__(self, graph: Flowgraph, inputs: Dict[str, InputSpec],
                 donate: bool = True):
        self.graph = graph
        self.inputs = dict(inputs)
        missing = set(graph.in_ports) - set(self.inputs)
        if missing:
            raise ValueError(f"no InputSpec for graph inputs {missing}")
        self._step_fn = graph.build_step()
        self._in_specs = {
            name: hostio.IOSpec(dtype=spec.dtype, shape=tuple(spec.shape))
            for name, spec in self.inputs.items()}
        self._out_specs: Dict[str, Any] = {}  # populated at trace time
        self._param_specs: Any = None
        self._states = None  # device-resident (includes source meta)
        self.params = graph.init_params()  # host-side, caller may mutate

        def _io_step(carry, params_enc, ins_enc, counts_enc):
            states, src_meta = carry
            params = hostio.tree_jit_decode(params_enc, self._param_specs)
            ins, new_meta = {}, {}
            for name in sorted(self._in_specs):
                data = hostio.jit_decode(ins_enc[name], self._in_specs[name])
                count = hostio.jit_decode(
                    counts_enc[name], hostio.IOSpec("int32", ()))
                meta = src_meta[name]
                ins[name] = Stream(data=data, count=count, meta=meta)
                new_meta[name] = meta.advanced(count)
            new_states, outs = self._step_fn(states, params, ins)
            outs_enc = {}
            for name, s in outs.items():
                data_enc, data_spec = hostio.jit_encode(s.data)
                count_enc, _ = hostio.jit_encode(s.count.astype(jnp.int32))
                self._out_specs[name] = data_spec
                outs_enc[name] = dict(data=data_enc, count=count_enc)
            return (new_states, new_meta), outs_enc

        self._io_step = jax.jit(_io_step, donate_argnums=(0,) if donate else ())

        def _init_carry():
            # init states are numpy constants -> embedded in the program;
            # nothing crosses the transfer path.
            states = jax.tree_util.tree_map(jnp.asarray, graph.init_states())
            meta = {name: StreamMeta.start(self.inputs[name].sample_rate)
                    for name in self.graph.in_ports}
            return states, meta

        self._init_jit = jax.jit(_init_carry)
        # observability counters (SURVEY §5: structured counters on the
        # host executor replacing per-block verbose printf)
        self.stats = dict(steps=0, samples_in=0, wall_time=0.0)

    # -- lifecycle ---------------------------------------------------------
    def reset(self):
        self._states = self._init_jit()
        return self

    # -- stepping ----------------------------------------------------------
    def dispatch(self, ins: Dict[str, np.ndarray],
                 counts: Optional[Dict[str, int]] = None,
                 params: Optional[Dict[str, Any]] = None):
        """Asynchronously dispatch one block; returns a pending handle
        whose results arrive via :meth:`fetch`.

        JAX dispatch is async, so several steps can be in flight — the
        device chains them through the carried states while the host
        overlaps the next upload with the previous compute. This is
        what hides the per-step transfer RTT (124 ms through the remote
        relay; the reference hides the same latency with its capture
        ring, lib/baz_rtl_source_c.h:84-96). :class:`StreamPump` keeps
        ``inflight`` handles pending.
        """
        if self._states is None:
            self.reset()
        if params is not None:
            self.params = params
        unknown = set(self.params) - {b.name for b in self.graph.blocks}
        if unknown:
            raise KeyError(
                f"params for unknown blocks {sorted(unknown)}; valid names: "
                f"{sorted(b.name for b in self.graph.blocks)}")
        params_enc, pspecs = hostio.tree_host_encode(self.params)
        self._param_specs = pspecs
        ins_enc, counts_enc = {}, {}
        for name, spec in self._in_specs.items():
            x = np.asarray(ins[name])
            if x.dtype.name != spec.dtype or tuple(x.shape) != spec.shape:
                raise ValueError(
                    f"input {name}: expected {spec.dtype}{spec.shape}, "
                    f"got {x.dtype.name}{x.shape}")
            enc, _ = hostio.host_encode(x)
            ins_enc[name] = enc
            c = np.int32((counts or {}).get(name, x.shape[0]))
            cenc, _ = hostio.host_encode(c)
            counts_enc[name] = cenc
        self._states, outs_enc = self._io_step(
            self._states, params_enc, ins_enc, counts_enc)
        self.stats["steps"] += 1
        self.stats["samples_in"] += sum(
            int((counts or {}).get(n, np.asarray(ins[n]).shape[0]))
            for n in self._in_specs)
        return outs_enc

    def fetch(self, outs_enc) -> Dict[str, Tuple[np.ndarray, int]]:
        """Block until a dispatched step's outputs are on the host."""
        result = {}
        for name, oe in outs_enc.items():
            data = hostio.host_decode(np.asarray(oe["data"]),
                                      self._out_specs[name])
            count = int(hostio.host_decode(np.asarray(oe["count"]),
                                           hostio.IOSpec("int32", ())))
            result[name] = (data, count)
        return result

    def step(self, ins: Dict[str, np.ndarray],
             counts: Optional[Dict[str, int]] = None,
             params: Optional[Dict[str, Any]] = None
             ) -> Dict[str, Tuple[np.ndarray, int]]:
        """Process one block. Returns {out_port: (np_data, valid_count)}."""
        import time as _time
        _t0 = _time.monotonic()
        result = self.fetch(self.dispatch(ins, counts, params))
        self.stats["wall_time"] += _time.monotonic() - _t0
        return result

    def throughput(self) -> float:
        """Host-observed samples/s over all steps so far."""
        return (self.stats["samples_in"] / self.stats["wall_time"]
                if self.stats["wall_time"] else 0.0)

    def profile(self, log_dir: str):
        """Context manager: capture an XLA profiler trace of the steps
        run inside it (viewable in TensorBoard / xprof)."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            jax.profiler.start_trace(log_dir)
            try:
                yield self
            finally:
                jax.profiler.stop_trace()

        return _ctx()

    def run(self, blocks: Iterable[Dict[str, np.ndarray]]):
        """Generator over an iterator of input-block dicts."""
        for ins in blocks:
            yield self.step(ins)
