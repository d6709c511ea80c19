"""Detectors: peak FSM, sync correlator, radar pulse reports."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.detect import Correlator, PeakDetector, RadarDetector


def run_blocks(block, x, block_size):
    state, params = block.init_state(), block.init_params()
    outs = [[] for _ in range(block.n_out)]
    for i in range(0, len(x), block_size):
        s = Stream.full(jnp.asarray(x[i:i + block_size]))
        state, ys = block.apply(state, params, s)
        for j, y in enumerate(ys):
            outs[j].append((np.asarray(y.data), int(y.count)))
    return outs


def test_peak_detector_finds_pulses():
    n = 4096
    x = np.zeros(n, np.float32)
    peaks_at = [500, 1500, 2500, 3500]
    for p in peaks_at:
        x[p - 3:p + 4] = np.array([0.2, 0.5, 0.8, 1.0, 0.8, 0.5, 0.2])
    pd = PeakDetector(min_diff=0.5, min_len=2, lockout=10)
    outs = run_blocks(pd, x, 1024)
    marks = np.concatenate([d for d, c in outs[0]])
    found = np.where(marks > 0)[0]
    assert len(found) == len(peaks_at)
    for f, p in zip(found, peaks_at):
        assert abs(f - p) <= 1, (found, peaks_at)


def test_peak_detector_lockout_suppresses():
    n = 1024
    x = np.zeros(n, np.float32)
    ramp = np.array([0.3, 1.0], np.float32)  # rise of 0.7 > min_diff
    x[100:102] = ramp
    x[110:112] = ramp  # within lockout of the first
    x[400:402] = ramp
    pd = PeakDetector(min_diff=0.5, lockout=50)
    outs = run_blocks(pd, x, 1024)
    marks = np.concatenate([d for d, c in outs[0]])
    found = np.where(marks > 0)[0]
    assert len(found) == 2


def test_peak_detector_block_invariance():
    rng = np.random.default_rng(5)
    x = np.abs(rng.standard_normal(8192)).astype(np.float32)
    x[::700] += 5.0
    pd1 = PeakDetector(min_diff=2.0, lockout=20)
    pd2 = PeakDetector(min_diff=2.0, lockout=20)
    m1 = np.concatenate([d for d, c in run_blocks(pd1, x, 1024)[0]])
    m2 = np.concatenate([d for d, c in run_blocks(pd2, x, 8192)[0]])
    np.testing.assert_array_equal(m1, m2)


def test_correlator_finds_sync():
    rng = np.random.default_rng(3)
    L, W = 63, 512
    sync = np.exp(2j * np.pi * rng.random(L)).astype(np.complex64)
    n = W * 8
    x = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    positions = [700, 2000, 3300]
    for p in positions:
        x[p:p + L] += sync
    x = x.astype(np.complex64)
    corr = Correlator(sync, window_length=W, threshold=L * 0.5, width=16)
    outs = run_blocks(corr, x, n)
    trig = outs[1][0][0]
    hits = np.where(trig > 0)[0]
    # causal latency: peak at p + L-1 + width//2 (see Correlator docs)
    expect = sorted(set((p + L - 1 + 8) // W for p in positions))
    assert sorted(hits.tolist()) == expect
    # peak magnitudes ~ L (coherent sum)
    assert np.all(trig[hits] > L * 0.8)
    # surface center bin should be the peak
    surf = outs[0][0][0]
    for h in hits:
        assert np.argmax(surf[h]) == 8  # width//2


def test_radar_detector_reports_bursts():
    n = 4096
    x = np.full(n, 0.1, np.float32)
    bursts = [(500, 40), (1500, 80), (3000, 25)]
    for s, l in bursts:
        x[s:s + l] = 2.0
    rd = RadarDetector(base_level=0.1, threshold_db=10.0)
    outs = run_blocks(rd, x, 4096)
    ev, count = outs[0][0]
    assert count == len(bursts)
    dec = RadarDetector.decode_events(ev, count)
    for i, (s, l) in enumerate(bursts):
        assert abs(dec[i, 0] - s) <= 1    # start (exact bitcast int32)
        assert abs(dec[i, 1] - l) <= 1    # length
        assert abs(dec[i, 2] - 2.0) < 1e-5  # max


def test_correlator_long_sync_fft_path():
    """L >= 64 dispatches to FFT correlation; results match the window
    formulation and the peak lands at the documented alignment."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.ops.detect import Correlator

    rng = np.random.default_rng(23)
    L = 127
    sync = (rng.standard_normal(L) + 1j * rng.standard_normal(L)) \
        .astype(np.complex64)
    sync /= np.sqrt(np.mean(np.abs(sync) ** 2))
    p = 500
    n = 2048
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x[p:p + L] += sync
    x = x.astype(np.complex64)

    width = 16
    blk = Correlator(sync, window_length=1024, threshold=L * 0.5,
                     width=width)
    state, params = blk.init_state(), blk.init_params()
    state, (surface, trig) = blk.apply(state, params,
                                       Stream.full(jnp.asarray(x)))
    trig = np.asarray(trig.data)[:int(trig.count)]
    assert trig[0] > 0, "long-sync correlator missed the burst"
    # peak alignment: p + L-1 + width//2 inside window 0
    surf = np.asarray(surface.data)[0]
    assert np.argmax(surf) == width // 2  # surface centered at the peak


def test_radar_detector_vectorized_vs_serial_mirror(rng):
    """The block-vectorized RadarDetector equals a per-sample serial
    mirror of the reference loop, including bursts spanning blocks."""
    import numpy as np
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream, StreamMeta
    from grbaz_tpu.ops.detect import RadarDetector

    thr_abs = 0.1 * (10.0 ** (10.0 / 10.0))  # base * threshold
    n, blocks = 512, 6
    x = (0.05 + 0.3 * (rng.random(n * blocks) < 0.15)
         * (0.5 + rng.random(n * blocks))).astype(np.float32)
    # force a long burst across a block boundary
    x[500:530] = 2.0

    # serial mirror (the reference's per-sample loop semantics)
    events_ref = []
    in_b, start, bsum, bmax = False, 0, 0.0, 0.0
    for i, xi in enumerate(x):
        above = xi >= thr_abs
        if above and not in_b:
            in_b, start, bsum, bmax = True, i, float(xi), float(xi)
        elif above:
            bsum += float(xi)
            bmax = max(bmax, float(xi))
        elif in_b:
            events_ref.append((start, i - start, bmax, bsum))
            in_b = False
    det = RadarDetector(base_level=0.1, threshold_db=10.0)
    st = det.init_state()
    pr = det.init_params()
    meta = StreamMeta.start(1e6)
    got = []
    for b in range(blocks):
        st, (ev,) = det.apply(st, pr,
                              Stream(jnp.asarray(x[b * n:(b + 1) * n]),
                                     jnp.int32(n), meta))
        rows = RadarDetector.decode_events(np.asarray(ev.data),
                                           int(ev.count))
        got.extend([tuple(r) for r in rows])
    assert len(got) == len(events_ref)
    for g, r in zip(got, events_ref):
        assert int(g[0]) == r[0] and int(g[1]) == r[1]
        assert abs(g[2] - r[2]) < 1e-5
        assert abs(g[3] - r[3]) < 1e-3


def test_peak_detector_vectorized_vs_serial_mirror():
    """Block-parallel PeakDetector equals the per-sample serial mirror
    (marks AND idx_diff) across signal shapes, parameterizations, and
    block boundaries (lockout == 0, look_ahead == 0 family)."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream

    def run(pd, x, bs, use_scan):
        st, pr = pd.init_state(), pd.init_params()
        ms, ds = [], []
        fn = pd._apply_scan if use_scan else pd.apply
        for i in range(0, len(x), bs):
            s = Stream.full(jnp.asarray(x[i:i + bs]))
            st, (m, d) = fn(st, pr, s)
            ms.append(np.asarray(m.data))
            ds.append(np.asarray(d.data))
        return np.concatenate(ms), np.concatenate(ds)

    rng = np.random.default_rng(1)
    cases = [
        dict(min_diff=0.0, min_len=1),
        dict(min_diff=0.3, min_len=2, drop=0.1),
        dict(min_diff=1.0, min_len=1, alpha=0.3),
        dict(min_diff=0.3, min_len=3, threshold=0.5),
    ]
    for kind in range(3):
        n, bs = 2048, 256
        if kind == 0:
            x = np.abs(rng.standard_normal(n)).astype(np.float32)
        elif kind == 1:
            x = rng.random(n).astype(np.float32)
            x[::50] += 3.0
        else:
            x = np.cumsum(rng.standard_normal(n)).astype(np.float32)
        for kw in cases:
            m1, d1 = run(PeakDetector(**kw), x, bs, True)
            m2, d2 = run(PeakDetector(**kw), x, bs, False)
            np.testing.assert_array_equal(m1, m2, err_msg=str((kind, kw)))
            np.testing.assert_array_equal(d1, d2, err_msg=str((kind, kw)))


def test_peak_detector_lockout_dispatches_to_scan():
    """lockout/look_ahead configs keep the serial FSM (documented)."""
    x = np.zeros(512, np.float32)
    x[100:102] = [0.3, 1.0]
    x[110:112] = [0.3, 1.0]
    pd = PeakDetector(min_diff=0.5, lockout=50)
    outs = run_blocks(pd, x, 512)
    marks = outs[0][0][0]
    assert len(np.where(marks > 0)[0]) == 1  # second rise locked out


def test_radar_detector_event_overflow_keeps_state_exact():
    """More bursts per block than MAX_EVENTS: the event list clamps and
    counts the loss, but the carried open-burst state stays exact
    (advisor r4 medium)."""
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream, StreamMeta

    cap = RadarDetector.MAX_EVENTS
    n = 4 * cap + 3  # alternating above/below: 2*cap+1 bursts, last open
    x = np.where(np.arange(n) % 2 == 0, 5.0, 0.01).astype(np.float32)
    x[-1] = 5.0  # ends open (odd length: last sample is even index)
    det = RadarDetector(base_level=0.1, threshold_db=10.0)
    st, pr = det.init_state(), det.init_params()
    meta = StreamMeta.start(1e6)
    st, (ev,) = det.apply(st, pr, Stream(jnp.asarray(x), jnp.int32(n), meta))
    assert int(ev.count) == cap                       # clamped
    assert int(st["dropped"]) == (2 * cap + 1) - cap  # loss observable
    # the open burst carried out is the single final sample — exact
    assert bool(st["in_burst"])
    assert int(st["start"]) == n - 1
    assert abs(float(st["bsum"]) - 5.0) < 1e-6
    assert abs(float(st["bmax"]) - 5.0) < 1e-6
    # and the first cap-1 packed events are still correct
    dec = RadarDetector.decode_events(np.asarray(ev.data), cap)
    assert np.all(dec[:cap - 1, 0] == np.arange(cap - 1) * 2)
    assert np.all(dec[:cap - 1, 1] == 1)
    assert np.allclose(dec[:cap - 1, 2], 5.0)
