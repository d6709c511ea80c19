"""Block protocol — the kernel unit of the compiled flowgraph.

The reference's unit is ``gr::block::general_work()`` running on its own
scheduler thread with dynamic ``consume()``/``forecast()``
(e.g. /root/reference/lib/baz_fractional_resampler_cc.cc:144-149).

Here a block is a *pure function*

    ``apply(state, params, *in_streams) -> (state', out_streams)``

with explicit carry state (filter tails, phase accumulators, FSM state)
and a separate ``params`` pytree for runtime-settable control values —
the functional replacement for the reference's setter methods and pmt
message ports (e.g. ``set_resamp_ratio`` via the "msg" port,
/root/reference/lib/baz_fractional_resampler_cc.cc:115-141). Params are
ordinary traced inputs to the compiled step, so the host control plane
can retune a running graph without recompilation.

Blocks never loop over samples in Python: they are vectorized /
``lax.scan`` formulations over whole sample blocks, so an entire
flowgraph fuses into one XLA program.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Sequence, Tuple

from grbaz_tpu.core.stream import Stream

_uid = itertools.count()


class Block:
    """Base class for flowgraph kernels.

    Subclasses set ``n_in`` / ``n_out`` and implement :meth:`apply`.
    ``init_state`` / ``init_params`` return pytrees (``None`` for
    stateless / parameterless blocks).
    """

    n_in: int = 1
    n_out: int = 1

    def __init__(self, name: str | None = None):
        # An explicit name is used verbatim — it is the handle the
        # control plane retunes through (``executor.params[name]``);
        # Flowgraph.add rejects duplicates. Auto-names get a uid so
        # anonymous blocks never collide.
        self.name = name if name else f"{type(self).__name__}_{next(_uid)}"

    # -- state / params ----------------------------------------------------
    def init_state(self) -> Any:
        return None

    def init_params(self) -> Any:
        return None

    # -- the kernel --------------------------------------------------------
    def apply(self, state: Any, params: Any,
              *ins: Stream) -> Tuple[Any, Tuple[Stream, ...]]:
        raise NotImplementedError

    # -- sugar -------------------------------------------------------------
    def __call__(self, *ins: Stream) -> Tuple[Any, Tuple[Stream, ...]]:
        """One-shot functional application with fresh state."""
        return self.apply(self.init_state(), self.init_params(), *ins)

    def __repr__(self):
        return f"<{type(self).__name__} {self.name} {self.n_in}->{self.n_out}>"


class FnBlock(Block):
    """Stateless block wrapping a pure ``fn(*datas) -> data`` on sample data."""

    def __init__(self, fn: Callable, n_in: int = 1, n_out: int = 1,
                 name: str | None = None, rate_scale: float = 1.0):
        if name is None:  # derive an auto-name; keep it collision-free
            name = f"{getattr(fn, '__name__', 'fn')}_{next(_uid)}"
        super().__init__(name)
        self.fn = fn
        self.n_in = n_in
        self.n_out = n_out
        self.rate_scale = rate_scale

    def apply(self, state, params, *ins: Stream):
        outs = self.fn(*(s.data for s in ins))
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        ref = ins[0]
        out_streams = tuple(
            ref.like(o, count=ref.count, rate_scale=self.rate_scale) for o in outs)
        return state, out_streams


def block_from_fn(fn: Callable = None, *, n_in: int = 1, n_out: int = 1,
                  name: str | None = None) -> Callable[..., FnBlock]:
    """Decorator: turn a pure array function into a Block factory.

    >>> @block_from_fn
    ... def conjugate(x):
    ...     return jnp.conj(x)
    >>> blk = conjugate()          # a fresh FnBlock instance
    """

    def wrap(f):
        def make(*args, **kwargs):
            if args or kwargs:
                import functools
                g = functools.partial(f, *args, **kwargs) if False else (
                    lambda *datas: f(*datas, *args, **kwargs))
                g.__name__ = f.__name__
                return FnBlock(g, n_in=n_in, n_out=n_out, name=name or f.__name__)
            return FnBlock(f, n_in=n_in, n_out=n_out, name=name or f.__name__)
        make.__name__ = f.__name__
        make.__doc__ = f.__doc__
        return make

    if fn is not None:
        return wrap(fn)
    return wrap


class AnyBlock(Block):
    """User-supplied kernel as a graph node — the "any block" escape
    hatch (grc/baz_any_source/sink/block.xml + baz_any_code.xml let
    users type raw maker / inline code into GRC; here the user supplies
    the pure function directly).

    ``fn(state, params, *ins) -> (state', Stream | (Stream, ...))`` runs
    inside the compiled step like any built-in block; ``init_state`` /
    ``init_params`` values (or zero-arg callables) supply the pytrees.
    """

    def __init__(self, fn: Callable, init_state=None, init_params=None,
                 n_in: int = 1, n_out: int = 1, name: str | None = None):
        super().__init__(name or getattr(fn, "__name__", "any"))
        self.fn = fn
        self._init_state = init_state
        self._init_params = init_params
        self.n_in = n_in
        self.n_out = n_out

    def init_state(self):
        s = self._init_state
        return s() if callable(s) else s

    def init_params(self):
        p = self._init_params
        return p() if callable(p) else p

    def apply(self, state, params, *ins: Stream):
        state, outs = self.fn(state, params, *ins)
        if isinstance(outs, Stream):
            outs = (outs,)
        return state, tuple(outs)


def any_code(source: str, n_in: int = 1, n_out: int = 1,
             name: str | None = None) -> Block:
    """Inline-code evaluator (the baz_any_code.xml capability): build a
    Block from a source string.

    Two injection modes, mirroring the reference's expression/code modes:

    * an *expression* over ``x`` (and ``jnp``/``np``) — becomes a
      stateless elementwise block: ``any_code("jnp.abs(x) ** 2")``;
    * a *code block* defining ``apply(state, params, *ins)`` and
      optionally ``init_state()`` / ``init_params()`` — becomes a full
      stateful AnyBlock.

    The namespace provides ``jax``, ``jnp``, ``np`` and ``Stream``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    ns = {"jax": jax, "jnp": jnp, "np": np, "Stream": Stream}
    try:
        code = compile(source, "<any_code>", "eval")
        is_expr = True
    except SyntaxError:
        code = compile(source, "<any_code>", "exec")
        is_expr = False

    if is_expr:
        def fn(*datas):
            local = dict(ns)
            local["x"] = datas[0]
            for i, d in enumerate(datas):
                local[f"x{i}"] = d
            return eval(code, local)  # noqa: S307 — explicit escape hatch
        fn.__name__ = name or "any_code"
        return FnBlock(fn, n_in=n_in, n_out=n_out, name=name)

    exec(code, ns)  # noqa: S102 — explicit escape hatch
    if "apply" not in ns:
        raise ValueError("any_code source must define apply(state, params, *ins)")
    return AnyBlock(ns["apply"], init_state=ns.get("init_state"),
                    init_params=ns.get("init_params"),
                    n_in=n_in, n_out=n_out, name=name or "any_code")
