"""Burster (interval + trigger modes), rx_time extraction, HopperDemux."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.ops.burst import (Burster, BursterConfig, decode_abs_events,
                                 rx_time_of)
from grbaz_tpu.ops.hopper import HopperDemux


def S(x, rate=1.0, dtype=None):
    arr = jnp.asarray(x if dtype is None else np.asarray(x, dtype))
    return Stream.full(arr, meta=StreamMeta.start(rate))


def test_burster_interval_mode_sample_grid():
    # interval 10 samples, burst length 4, block of 32
    cfg = BursterConfig(sample_rate=100, burst_length=4, interval=10,
                        sample_interval=True, max_bursts=8)
    b = Burster(cfg, dtype=jnp.float32)
    x = np.arange(32, dtype=np.float32)
    st, (frames, ev) = b.apply(b.init_state(), b.init_params(), S(x))
    # starts at 0, 10, 20 fit fully (28 + 4 > 32 ⇒ 30 doesn't fit... 20+4<=32 ✓, 30+4>32 ✗)
    assert int(frames.count) == 3
    f = np.asarray(frames.data)
    np.testing.assert_array_equal(f[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(f[1], [10, 11, 12, 13])
    np.testing.assert_array_equal(f[2], [20, 21, 22, 23])
    # next block: carried start is 30 - 32 = -2 -> window spans boundary
    assert int(st["next_start"]) == -2
    x2 = np.arange(32, 64, dtype=np.float32)
    s2 = S(x2)
    s2 = Stream(s2.data, s2.count, s2.meta.advanced(32))
    st, (frames2, ev2) = b.apply(st, b.init_params(), s2)
    f2 = np.asarray(frames2.data)
    np.testing.assert_array_equal(f2[0], [30, 31, 32, 33])  # from history
    np.testing.assert_array_equal(f2[1], [40, 41, 42, 43])
    # event rows carry the exact absolute start as bitcast limbs
    rows = decode_abs_events(ev2.data, int(ev2.count))
    assert rows[0][0] == 30.0 and rows[0][1] == 4.0


def test_burster_seconds_interval_and_config():
    cfg = BursterConfig(sample_rate=1000, burst_length=8, interval=0.016)
    assert cfg.interval_samples() == 16
    b = Burster(cfg, dtype=jnp.float32)
    st, (frames, _) = b.apply(b.init_state(), b.init_params(),
                              S(np.ones(64, np.float32), rate=1000))
    assert int(frames.count) == 4  # starts 0,16,32,48


def test_burster_trigger_mode_with_tag_lengths():
    cfg = BursterConfig(burst_length=6, trigger_on_tags=True,
                        use_tag_lengths=True, max_bursts=4)
    b = Burster(cfg, dtype=jnp.float32)
    x = np.arange(40, dtype=np.float32)
    ev = np.zeros((4, 3), np.float32)
    ev[0] = (5, 0, 6)    # start 5, full length
    ev[1] = (20, 0, 3)   # start 20, short burst of 3
    trig = Stream(jnp.asarray(ev), jnp.int32(2), StreamMeta.start(1.0))
    st, (frames, rows) = b.apply(b.init_state(), b.init_params(), S(x), trig)
    assert int(frames.count) == 2
    f = np.asarray(frames.data)
    np.testing.assert_array_equal(f[0], [5, 6, 7, 8, 9, 10])
    np.testing.assert_array_equal(f[1], [20, 21, 22, 0, 0, 0])  # masked tail
    assert decode_abs_events(rows.data, 2)[1][1] == 3.0


def test_rx_time_of_exact():
    s = Stream.full(jnp.zeros(16, jnp.float32),
                    meta=StreamMeta.start(100.0, epoch_sec=1700000000,
                                          epoch_frac=0.25))
    m = s.meta.advanced(150)  # 150 samples at 100 S/s = 1.5 s
    s2 = Stream(s.data, s.count, m)
    whole, frac = rx_time_of(s2)
    assert whole == 1700000001
    np.testing.assert_allclose(frac, 0.75, atol=1e-6)


def test_hopper_demux_chunks_and_transient_drop():
    # 3 freqs, dwell 8, drop 2 -> each lane gets 6 samples per dwell
    h = HopperDemux(n_freqs=3, dwell=8, drop_length=2)
    n = 48  # exactly two full cycles
    x = np.arange(n, dtype=np.float32)
    st, outs = h.apply(h.init_state(), None, S(x))
    assert len(outs) == 3
    for f, out in enumerate(outs):
        assert int(out.count) == 12
        got = np.asarray(out.data)[:12]
        exp = np.concatenate([np.arange(f * 8 + 2, f * 8 + 8),
                              np.arange(24 + f * 8 + 2, 24 + f * 8 + 8)])
        np.testing.assert_array_equal(got, exp.astype(np.float32))
    # carry chains the grid across an unaligned block split
    h2 = HopperDemux(n_freqs=3, dwell=8, drop_length=2)
    st2 = h2.init_state()
    st2, outs_a = h2.apply(st2, None, S(x[:20]))
    st2, outs_b = h2.apply(st2, None, S(x[20:40]))
    st2, outs_c = h2.apply(st2, None, S(x[40:]))
    for f in range(3):
        whole = np.asarray(outs[f].data)[:int(outs[f].count)]
        split = np.concatenate([
            np.asarray(o.data)[:int(o.count)]
            for o in (outs_a[f], outs_b[f], outs_c[f])])
        np.testing.assert_array_equal(split, whole)


def test_hopper_demux_respects_input_count():
    h = HopperDemux(n_freqs=2, dwell=4, drop_length=0)
    x = Stream(jnp.arange(16, dtype=jnp.float32), jnp.int32(8),
               StreamMeta.start(1.0))
    st, (a, b) = h.apply(h.init_state(), None, x)
    # only the first 8 valid samples distribute: lanes get 4 each
    assert int(a.count) == 4 and int(b.count) == 4
    np.testing.assert_array_equal(np.asarray(a.data)[:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(b.data)[:4], [4, 5, 6, 7])
