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
        self.name = f"{name or type(self).__name__}_{next(_uid)}"

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
        super().__init__(name or getattr(fn, "__name__", "fn"))
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
