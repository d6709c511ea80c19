"""Burst/timing machinery: gate, tagger, buffer, merge, sweep, rate sync."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream, StreamMeta, decode_u32
from grbaz_tpu.net.rate_synchroniser import RateSynchroniser
from grbaz_tpu.ops.burst import (BurstBuffer, BurstTagger, Gate, Merge,
                                 NonBlocker, Sweep, TimeKeeper,
                                 decode_abs_events)
from grbaz_tpu.ops.resampler import FractionalResampler


def stream(x, rate=1.0, abs_index=0):
    return Stream.full(jnp.asarray(x),
                       meta=StreamMeta.start(rate, abs_index=abs_index))


def test_gate_extracts_bursts():
    n = 2048
    sig = np.arange(n, dtype=np.float32)
    trig = np.zeros(n, np.float32)
    trig[100:120] = 1.0   # burst 1
    trig[900:905] = 1.0   # burst 2
    g = Gate(threshold=0.5, trigger_length=10)
    state, (y, ev) = g.apply(g.init_state(), g.init_params(),
                             stream(sig), stream(trig))
    out = np.asarray(y.data)
    # gated: signal passes during bursts (trigger span + trigger_length tail)
    assert out[100] == 100 and out[119] == 119
    assert out[50] == 0 and out[500] == 0
    assert out[900] == 900
    nev = int(ev.count)
    assert nev == 2
    rows = decode_abs_events(ev.data, nev)
    assert abs(rows[0, 0] - 100) <= 1     # abs start of burst 1
    assert 20 <= rows[0, 1] <= 32         # length ~ 20 + trigger_length
    assert abs(rows[1, 0] - 900) <= 1


def test_gate_delay_stamps_tx_time():
    n = 512
    trig = np.zeros(n, np.float32)
    trig[50] = 1.0
    g = Gate(threshold=0.5, trigger_length=4, delay_samples=1000)
    state, (y, ev) = g.apply(g.init_state(), g.init_params(),
                             stream(np.ones(n, np.float32), abs_index=5000),
                             stream(trig))
    rows = decode_abs_events(ev.data, int(ev.count))
    assert int(ev.count) == 1
    # absolute start = 5000 (block base) + 50 (rel) + 1000 (delay)
    assert abs(rows[0, 0] - 6050) <= 1


def test_burst_tagger_and_buffer_roundtrip():
    n = 1024
    marks = np.zeros(n, np.uint8)
    marks[[100, 400]] = 1
    bt = BurstTagger(length=32)
    st, (sob, eob) = bt.apply(bt.init_state(), None, stream(marks))
    sob_np, eob_np = np.asarray(sob.data), np.asarray(eob.data)
    assert sob_np[100] == 1 and eob_np[131] == 1
    assert sob_np[400] == 1 and eob_np[431] == 1

    sig = np.arange(n, dtype=np.float32)
    bb = BurstBuffer(max_len=64, dtype=jnp.float32)
    st2, (frames, lens) = bb.apply(bb.init_state(), None, stream(sig),
                                   sob, eob)
    assert int(frames.count) == 2
    f = np.asarray(frames.data)
    l = np.asarray(lens.data)
    assert l[0] == 32 and l[1] == 32
    np.testing.assert_array_equal(f[0, :32], np.arange(100, 132))
    np.testing.assert_array_equal(f[1, :32], np.arange(400, 432))


def test_merge_places_bursts_by_abs_time():
    n = 1024
    main = np.zeros(n, np.float32)
    frames = np.zeros((8, 16), np.float32)
    frames[0] = 1.0
    frames[1] = 2.0
    starts = np.zeros(8, np.uint32)
    starts[0] = 5000 + 100       # lands at rel 100
    starts[1] = 5000 + 1020      # straddles the end: clipped
    m = Merge(max_burst_len=16)
    bursts = Stream(jnp.asarray(frames), jnp.int32(2),
                    StreamMeta.start(1.0))
    sts = Stream(jnp.asarray(starts), jnp.int32(2), StreamMeta.start(1.0))
    st, (y,) = m.apply(None, None, stream(main, abs_index=5000), bursts, sts)
    out = np.asarray(y.data)
    assert np.all(out[100:116] == 1.0)
    assert np.all(out[1020:] == 2.0) and out[1019] == 0.0


def test_sweep_ramps_and_holds():
    sw = Sweep(start=0.0)
    params = dict(target=np.float32(100.0), rate=np.float32(1000.0))
    pace = stream(np.zeros(512, np.float32), rate=1000.0)  # 1 Hz/sample
    state = sw.init_state()
    state, (r1,) = sw.apply(state, params, pace)
    v1 = np.asarray(r1.data)
    assert abs(v1[0] - 1.0) < 1e-4 and abs(v1[98] - 99.0) < 1e-3
    assert np.all(v1[99:] <= 100.0 + 1e-4) and abs(v1[-1] - 100.0) < 1e-4
    # holds at target on the next block
    state, (r2,) = sw.apply(state, params, pace)
    assert np.all(np.abs(np.asarray(r2.data) - 100.0) < 1e-4)


def test_non_blocker_zero_fills():
    nb = NonBlocker()
    s = Stream(jnp.asarray(np.ones(256, np.float32)), jnp.int32(100),
               StreamMeta.start(1.0))
    st, (y,) = nb.apply(None, None, s)
    out = np.asarray(y.data)
    assert int(y.count) == 256
    assert np.all(out[:100] == 1.0) and np.all(out[100:] == 0.0)


def test_timekeeper_reports_time():
    tk = TimeKeeper()
    s = stream(np.zeros(64, np.float32), rate=48000.0, abs_index=96000)
    st, (passthru, rep) = tk.apply(tk.init_state(), tk.init_params(), s)
    r = np.asarray(rep.data)[0]
    assert decode_u32(r[1]) == 96000 and r[4] == 48000.0


def test_rate_synchroniser_locks_and_corrects():
    rs = RateSynchroniser(target_period=100.0, base_ratio=5.0,
                          alpha=0.3, lock_window=8, lock_sd=1e-3)
    # stream runs 0.1% fast: measured period 100.1
    updates = 0
    for _ in range(50):
        p = rs.feed(100.1)
        if p is not None:
            updates += 1
    assert rs.locked
    assert updates < 50  # corrections stop after lock
    ip, fp = rs.ppb()
    assert abs((ip + fp) / 1e9 - 5.005) < 1e-3
    # params are exact fixed-point for the resampler
    pr = rs.params()
    assert "inc_int" in pr and "inc_frac" in pr
    # glitch rejection
    before = rs.ewma
    rs.feed(200.0)
    assert rs.ewma == before


def test_gate_event_start_exact_past_2pow25():
    """Burst opening past sample 2^25 round-trips its exact absolute
    start through the event row (f32-converted indices would quantize
    at 2^24; the limbs are bitcast, VERDICT r2 item 4)."""
    n = 512
    abs_base = (1 << 25) + 12345
    trig = np.zeros(n, np.float32)
    trig[37] = 1.0
    g = Gate(threshold=0.5, trigger_length=4, delay_samples=3)
    st, (y, ev) = g.apply(g.init_state(), g.init_params(),
                          stream(np.ones(n, np.float32),
                                 abs_index=abs_base),
                          stream(trig, abs_index=abs_base))
    rows = decode_abs_events(ev.data, int(ev.count))
    assert int(rows[0, 0]) == abs_base + 37 + 3


def test_gate_event_limbs_cross_2pow32():
    """Limb carry: block base near 2^32; start crosses the limb edge."""
    n = 256
    abs_base = (1 << 32) - 100
    trig = np.zeros(n, np.float32)
    trig[150] = 1.0  # absolute start = 2^32 + 50
    g = Gate(threshold=0.5, trigger_length=2)
    st, (y, ev) = g.apply(g.init_state(), g.init_params(),
                          stream(np.ones(n, np.float32),
                                 abs_index=abs_base),
                          stream(trig, abs_index=abs_base))
    rows = decode_abs_events(ev.data, int(ev.count))
    assert int(rows[0, 0]) == (1 << 32) + 50


def test_gate_vectorized_vs_serial_mirror():
    """Block-parallel Gate equals the per-sample serial mirror: gated
    signal bit-for-bit, plus event rows (abs start / length / peak),
    for both retriggerable modes and bursts spanning block boundaries."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream, StreamMeta
    from grbaz_tpu.ops.burst import Gate, decode_abs_events

    def run(gate, x, trig, bs, use_scan):
        st, pr = gate.init_state(), gate.init_params()
        meta = StreamMeta.start(1e6)
        ys, evs = [], []
        fn = gate._apply_scan if use_scan else gate.apply
        for i in range(0, len(x), bs):
            sx = Stream(jnp.asarray(x[i:i + bs]), jnp.int32(bs), meta)
            stq = Stream(jnp.asarray(trig[i:i + bs]), jnp.int32(bs), meta)
            st, (y, ev) = fn(st, pr, sx, stq)
            ys.append(np.asarray(y.data))
            evs.extend(tuple(r) for r in
                       decode_abs_events(np.asarray(ev.data),
                                         int(ev.count)))
        return np.concatenate(ys), evs

    rng = np.random.default_rng(0)
    for trial in range(8):
        n, bs = 256 * 6, 256
        tl = int(rng.integers(1, 40))
        retrig = trial % 2 == 0
        dens = [0.02, 0.2, 0.6][trial % 3]
        trig = ((rng.random(n) < dens)
                * (0.6 + rng.random(n))).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        cfg = dict(threshold=0.5, trigger_length=tl, retriggerable=retrig)
        y1, e1 = run(Gate(**cfg), x, trig, bs, use_scan=True)
        y2, e2 = run(Gate(**cfg), x, trig, bs, use_scan=False)
        np.testing.assert_array_equal(y1, y2, err_msg=str((trial, cfg)))
        assert len(e1) == len(e2), (trial, cfg, len(e1), len(e2))
        for a, b in zip(e1, e2):
            assert a[0] == b[0] and a[1] == b[1], (trial, cfg, a, b)
            assert abs(a[2] - b[2]) < 1e-6, (trial, cfg, a, b)


def test_burst_buffer_vectorized_vs_serial_mirror():
    """Block-parallel BurstBuffer equals the per-sample mirror: frame
    contents, lengths, and counts, including bursts spanning multiple
    blocks and max_len truncation."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream, StreamMeta
    from grbaz_tpu.ops.burst import BurstBuffer

    def run(bb, x, so, eo, bs, use_scan):
        st, pr = bb.init_state(), bb.init_params()
        meta = StreamMeta.start(1e6)
        out = []
        fn = bb._apply_scan if use_scan else bb.apply
        for i in range(0, len(x), bs):
            args = [Stream(jnp.asarray(a[i:i + bs]), jnp.int32(bs), meta)
                    for a in (x, so, eo)]
            st, (fr, ln) = fn(st, pr, *args)
            nb = int(fr.count)
            fr, ln = np.asarray(fr.data), np.asarray(ln.data)
            for k in range(min(nb, bb.MAX_BURSTS)):
                out.append((int(ln[k]), fr[k, :int(ln[k])].copy()))
        return out

    rng = np.random.default_rng(2)
    for trial in range(6):
        n, bs = 1024, 256
        ml = [8, 32, 100][trial % 3]
        so = (rng.random(n) < 0.05).astype(np.int32)
        eo = (rng.random(n) < [0.08, 0.02, 0.005][trial % 3]) \
            .astype(np.int32)
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        b1 = run(BurstBuffer(ml), x, so, eo, bs, True)
        b2 = run(BurstBuffer(ml), x, so, eo, bs, False)
        assert len(b1) == len(b2), (trial, ml, len(b1), len(b2))
        for (l1, f1), (l2, f2) in zip(b1, b2):
            assert l1 == l2, (trial, ml, l1, l2)
            np.testing.assert_array_equal(f1, f2, err_msg=str((trial, ml)))
