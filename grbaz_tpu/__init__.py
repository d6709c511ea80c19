"""grbaz_tpu — a TPU-native software-radio framework.

A from-scratch re-imagining of the capabilities of ``balint256/gr-baz``
(plus the GNU Radio runtime services it relies on) as a statically
compiled XLA dataflow system:

* A flowgraph is a DAG of *pure* kernels over
  ``(carry_state, sample_block) -> (carry_state', out_block)``.
* The whole graph compiles to ONE XLA program via ``jax.jit`` and is
  iterated over fixed-size sample blocks.
* Rate-changing blocks produce statically-bounded outputs with validity
  counts instead of dynamic ``consume()``.
* Sequential state machines (AGC, DPLL, decoders) are expressed as
  ``lax.scan`` / associative-scan formulations.
* Multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with
  halo (overlap-save) exchange on the time axis and embarrassing
  sharding on the channel axis.

Unlike gr-baz (an out-of-tree module riding GNU Radio's thread-per-block
scheduler — see /root/reference/lib), this package contains its own
runtime: ``grbaz_tpu.core`` is the scheduler/executor equivalent of
GNU Radio's ``gr::top_block`` layer.
"""

__version__ = "0.1.0"

from grbaz_tpu.core.stream import Stream, StreamMeta, stream_flags  # noqa: F401
from grbaz_tpu.core.block import Block, block_from_fn  # noqa: F401
from grbaz_tpu.core.graph import Flowgraph  # noqa: F401
