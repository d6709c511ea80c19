"""f32 IO laundering: bit-exact roundtrips for every dtype, both ways."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grbaz_tpu.core import hostio


CASES = [
    np.arange(10, dtype=np.float32) * 1.5,
    (np.arange(6) + 1j * np.arange(6)[::-1]).astype(np.complex64),
    np.arange(-5, 5, dtype=np.int32) * 100000,
    np.array([0, 1, 2**31 - 1, 2**31, 2**32 - 1], dtype=np.uint32),
    np.arange(-7, 6, dtype=np.int16) * 1000,   # odd length
    np.array([0, 1, 65535, 32768], dtype=np.uint16),
    np.arange(-5, 6, dtype=np.int8) * 11,      # length 11 (pad to 12)
    np.array([0, 1, 127, 128, 255, 7], dtype=np.uint8),  # length 6 (pad to 8)
    np.array([True, False, True]),
    np.int32(42),                              # scalar
    np.uint32(0xDEADBEEF),
    np.complex64(3 - 4j),
    np.float32(2.5),
    np.ones((3, 4), np.complex64) * (1 + 2j),  # 2-D
]


@pytest.mark.parametrize("x", CASES, ids=lambda x: f"{np.asarray(x).dtype}-{np.asarray(x).shape}")
def test_host_to_device_roundtrip(x):
    """host_encode -> (transfer) -> jit_decode == identity."""
    enc, spec = hostio.host_encode(x)
    assert enc.dtype == np.float32
    out = jax.jit(lambda e: hostio.jit_decode(e, spec))(enc)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert np.asarray(out).dtype == np.asarray(x).dtype


@pytest.mark.parametrize("x", CASES, ids=lambda x: f"{np.asarray(x).dtype}-{np.asarray(x).shape}")
def test_device_to_host_roundtrip(x):
    """jit_encode -> (transfer) -> host_decode == identity."""
    spec_box = {}

    def f(v):
        enc, spec = hostio.jit_encode(v)
        spec_box["spec"] = spec
        return enc

    enc = jax.jit(f)(jnp.asarray(np.asarray(x)))
    assert np.asarray(enc).dtype == np.float32
    out = hostio.host_decode(np.asarray(enc), spec_box["spec"])
    np.testing.assert_array_equal(out, np.asarray(x))
    assert out.dtype == np.asarray(x).dtype


def test_tree_roundtrips():
    tree = dict(a=np.arange(5, dtype=np.int16),
                b=[np.complex64(1j), np.ones(3, np.float32)],
                c=np.bool_(True))
    enc, specs = hostio.tree_host_encode(tree)
    dec = jax.jit(lambda e: hostio.tree_jit_decode(e, specs))(enc)
    flat_in, _ = jax.tree_util.tree_flatten(tree)
    flat_out, _ = jax.tree_util.tree_flatten(dec)
    for a, b in zip(flat_in, flat_out):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_stream_pump_end_to_end():
    """Feeder/runner pipeline: blocks flow source -> executor -> sinks."""
    import time
    import jax.numpy as jnp
    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.core.graph import Flowgraph
    from grbaz_tpu.core.block import FnBlock
    from grbaz_tpu.core.pump import StreamPump

    n = 1024
    fg = Flowgraph("pump_test")
    sq = FnBlock(lambda x: (x * x).real.astype(jnp.float32), name="sq")
    fg.input("iq", sq)
    fg.output("power", sq)
    ex = StreamExecutor(fg, {"iq": InputSpec((n,), "complex64", 1e6)})

    fed = [0]

    def source():
        if fed[0] >= 8:
            return None
        fed[0] += 1
        return {"iq": np.full(n, fed[0], np.complex64)}

    got = []
    pump = StreamPump(ex, source, {"power": lambda d, c: got.append(
        (float(d[0]), int(c)))})
    pump.start()
    deadline = time.monotonic() + 20
    while len(got) < 8 and time.monotonic() < deadline:
        time.sleep(0.02)
    pump.stop()
    assert len(got) >= 8
    assert [g[0] for g in got[:8]] == [float(k * k) for k in range(1, 9)]
    assert all(g[1] == n for g in got[:8])
    st = pump.stats()
    assert st["blocks_out"] >= 8 and st["overruns"] == 0


def test_stream_pump_zero_fill_underrun():
    """A dry source with zero_fill keeps blocks flowing (non_blocker)."""
    import time
    import jax.numpy as jnp
    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.core.graph import Flowgraph
    from grbaz_tpu.core.block import FnBlock
    from grbaz_tpu.core.pump import StreamPump

    n = 256
    fg = Flowgraph("pump_zero")
    ident = FnBlock(lambda x: x, name="ident")
    fg.input("iq", ident)
    fg.output("out", ident)
    ex = StreamExecutor(fg, {"iq": InputSpec((n,), "complex64", 1e6)})

    got = []
    pump = StreamPump(ex, lambda: None, {"out": lambda d, c: got.append(c)},
                      zero_fill=True)
    pump.start()
    deadline = time.monotonic() + 20
    while len(got) < 3 and time.monotonic() < deadline:
        time.sleep(0.02)
    pump.stop()
    assert len(got) >= 3
    assert pump.stats()["underruns"] >= 3
