"""Flowgraph DAG + static compiler + streaming executor.

This module is the replacement for the GNU Radio runtime the reference
rides on (``gr::top_block`` + thread-per-block scheduler + circular
buffers — SURVEY.md L1). Instead of one thread per block with dynamic
backpressure, the whole DAG is traced once into a single XLA program:

    step : (states, params, {in_port: Stream}) -> (states', {out_port: Stream})

and the host :class:`StreamingExecutor` iterates it over fixed-size
sample blocks, feeding source ports from host iterators (sockets, files)
and draining sink ports. Per-block threads, locks and ring buffers
disappear; XLA fuses the entire chain (filter -> demod -> resample ->
decode) into one device program, which is what lets a WBFM chain run at
HBM speed instead of memcpy speed.

Control plane: ``params`` is a dict pytree of runtime-settable values
(the reference's setters / pmt message ports). The executor re-passes it
every step, so host code may retune any block between blocks of samples
without recompiling — the functional analog of
``set_resamp_ratio``/``set_freq`` calls landing on a running graph.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Tuple

import jax

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream


class Flowgraph:
    """A DAG of :class:`Block` nodes with named external input/output ports."""

    def __init__(self, name: str = "flowgraph"):
        self.name = name
        self.blocks: List[Block] = []
        # (dst_block_name, dst_port) -> (src_block_name, src_port)
        self.edges: Dict[Tuple[str, int], Tuple[str, int]] = {}
        # external ports
        self.in_ports: Dict[str, Tuple[str, int]] = {}   # port name -> (block, in_port)
        self.out_ports: Dict[str, Tuple[str, int]] = {}  # port name -> (block, out_port)
        self._by_name: Dict[str, Block] = {}

    # -- construction ------------------------------------------------------
    def add(self, block: Block) -> Block:
        if block.name in self._by_name:
            raise ValueError(f"duplicate block {block.name}")
        self.blocks.append(block)
        self._by_name[block.name] = block
        return block

    @staticmethod
    def _endpoint(ep) -> Tuple[Block, int]:
        if isinstance(ep, Block):
            return ep, 0
        blk, port = ep
        return blk, int(port)

    def connect(self, src, dst) -> None:
        """connect(src_block[, port], dst_block[, port]). Endpoints are
        ``block`` or ``(block, port)``."""
        sb, sp = self._endpoint(src)
        db, dp = self._endpoint(dst)
        for b in (sb, db):
            if b.name not in self._by_name:
                self.add(b)
        key = (db.name, dp)
        if key in self.edges:
            raise ValueError(f"input {key} already connected")
        self.edges[key] = (sb.name, sp)

    def chain(self, *blocks) -> Block:
        """Connect blocks in series (port 0 -> port 0); returns the last."""
        for a, b in zip(blocks, blocks[1:]):
            self.connect(a, b)
        return blocks[-1]

    def input(self, name: str, dst) -> None:
        db, dp = self._endpoint(dst)
        if db.name not in self._by_name:
            self.add(db)
        self.in_ports[name] = (db.name, dp)

    def output(self, name: str, src) -> None:
        sb, sp = self._endpoint(src)
        if sb.name not in self._by_name:
            self.add(sb)
        self.out_ports[name] = (sb.name, sp)

    # -- compilation -------------------------------------------------------
    def _topo_order(self) -> List[Block]:
        deps: Dict[str, set] = {b.name: set() for b in self.blocks}
        for (dst, _dp), (src, _sp) in self.edges.items():
            deps[dst].add(src)
        order, ready = [], [b for b in self.blocks if not deps[b.name]]
        placed = set()
        while ready:
            b = ready.pop(0)
            order.append(b)
            placed.add(b.name)
            for c in self.blocks:
                if c.name not in placed and c not in ready and deps[c.name] <= placed:
                    ready.append(c)
        if len(order) != len(self.blocks):
            cyc = [b.name for b in self.blocks if b.name not in placed]
            raise ValueError(f"flowgraph has a cycle involving {cyc}")
        return order

    def init_states(self) -> Dict[str, Any]:
        return {b.name: b.init_state() for b in self.blocks}

    def init_params(self) -> Dict[str, Any]:
        return {b.name: b.init_params() for b in self.blocks}

    def build_step(self) -> Callable:
        """Build the pure (unjitted) step function for this graph."""
        order = self._topo_order()
        edges = dict(self.edges)
        in_ports = dict(self.in_ports)
        out_ports = dict(self.out_ports)

        def step(states: Dict[str, Any], params: Dict[str, Any],
                 ext_in: Dict[str, Stream]):
            produced: Dict[Tuple[str, int], Stream] = {}
            # seed external inputs
            port_feed: Dict[Tuple[str, int], Stream] = {}
            for pname, (bname, bport) in in_ports.items():
                port_feed[(bname, bport)] = ext_in[pname]
            new_states = dict(states)
            for blk in order:
                ins = []
                for p in range(blk.n_in):
                    key = (blk.name, p)
                    if key in port_feed:
                        ins.append(port_feed[key])
                    elif key in edges:
                        ins.append(produced[edges[key]])
                    else:
                        raise ValueError(f"unconnected input {key}")
                st, outs = blk.apply(states[blk.name], params[blk.name], *ins)
                new_states[blk.name] = st
                for p, o in enumerate(outs):
                    produced[(blk.name, p)] = o
            ext_out = {pname: produced[(bname, bport)]
                       for pname, (bname, bport) in out_ports.items()}
            return new_states, ext_out

        return step

    def compile(self, donate: bool = True) -> "CompiledFlowgraph":
        step = self.build_step()
        jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
        return CompiledFlowgraph(self, step, jitted)


class CompiledFlowgraph:
    """A compiled flowgraph: one jitted step + its initial state/params."""

    def __init__(self, graph: Flowgraph, step_fn: Callable, jitted: Callable):
        self.graph = graph
        self.step_fn = step_fn  # unjitted, for composition inside larger jits
        self.step = jitted

    def run_stream(self, ext_in_iter: Iterable[Dict[str, Stream]],
                   params: Dict[str, Any] | None = None,
                   states: Dict[str, Any] | None = None):
        """Generator: run the graph over a host iterator of input blocks.

        Yields ``(ext_out, states)`` per step. ``params`` may be mutated
        between iterations by the caller (the control plane).
        """
        states = self.graph.init_states() if states is None else states
        params = self.graph.init_params() if params is None else params
        for ext_in in ext_in_iter:
            states, ext_out = self.step(states, params, ext_in)
            yield ext_out, states
