"""NativeCallbackX/NativeMux, FECSync, simple/dual usrp, LUTs,
missile launcher, view flipper — the SURVEY §2 long-tail closeout."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.models.fec_sync import (CHANGE_CONJUGATION, CHANGE_ROTATION,
                                       FECSync, FECSyncXform)
from grbaz_tpu.ops.mux import (NativeCallbackX, NativeMux, dispatch_events,
                               threshold_events)
from grbaz_tpu.utils.lut import (char_to_float_lut, char_to_short_lut,
                                 convert_u8_iq, lut_c_source)
from grbaz_tpu.utils.missile_launcher import (CMD_FIRE, CMD_LEFT, CMD_RIGHT,
                                              CMD_STOP, MissileLauncher)
from grbaz_tpu.viz.flipper import ViewFlipper


def S(x, rate=1.0):
    return Stream.full(jnp.asarray(x), meta=StreamMeta.start(rate))


# -- native_callback_x --------------------------------------------------------

def test_threshold_events_rising_edges_with_carry():
    # block 1 ends above threshold; block 2 starts above -> no re-trigger
    x1 = np.array([0., 0., 2., 3., 1., 5.], np.float32)   # edges at 2, 5
    x2 = np.array([5., 0., 7., 0.], np.float32)           # edge at 2
    t1, v1, n1, above = threshold_events(jnp.asarray(x1), 1.5,
                                         jnp.bool_(False), 8)
    assert int(n1) == 2
    np.testing.assert_array_equal(np.asarray(t1[:2]), [2, 5])
    np.testing.assert_array_equal(np.asarray(v1[:2]), [2.0, 5.0])
    t2, v2, n2, _ = threshold_events(jnp.asarray(x2), 1.5, above, 8)
    # x2[0]=5 continues the high run from block 1: not a new edge
    assert int(n2) == 1 and int(t2[0]) == 2 and float(v2[0]) == 7.0


def test_native_callback_block_and_host_dispatch():
    blk = NativeCallbackX(threshold_enable=True, threshold_level=1.0,
                          max_events=8)
    x = np.zeros(32, np.float32)
    x[5] = 2.0
    x[20] = 3.0
    st, (ev,) = blk.apply(blk.init_state(), blk.init_params(), S(x))
    assert int(ev.count) == 2
    got = []

    class Target:
        def callback(self, value, samples_processed):
            got.append((value, samples_processed))

    dispatch_events(Target(), np.asarray(ev.data), int(ev.count),
                    abs_base=1000)
    assert got == [(2.0, 1005), (3.0, 1020)]


def test_native_callback_unthresholded_mode():
    blk = NativeCallbackX(threshold_enable=False, max_events=4)
    st, (ev,) = blk.apply(blk.init_state(), blk.init_params(),
                          S(np.arange(16, dtype=np.float32)))
    # every sample is an event, capacity-bounded
    assert int(ev.count) == 4
    np.testing.assert_array_equal(np.asarray(ev.data)[:, 0], [0, 1, 2, 3])


# -- native_mux ---------------------------------------------------------------

def _mk_events(times, n, cap=8):
    ev = np.full((cap, 2), 2.0 ** 30, np.float32)
    for i, t in enumerate(times):
        ev[i] = (t, 1.0)
    s = Stream.full(jnp.asarray(ev), meta=StreamMeta.start(1.0))
    return Stream(data=s.data, count=jnp.int32(len(times)), meta=s.meta)


def test_native_mux_switches_at_future_time():
    n = 64
    mux = NativeMux(latency=10, trigger_count=4)
    main = S(np.zeros(n, np.float32))
    alt = S(np.ones(n, np.float32))
    st, (out,) = mux.apply(mux.init_state(), None, main, alt,
                           _mk_events([5], n))
    y = np.asarray(out.data)
    expect = np.zeros(n, np.float32)
    expect[15:19] = 1.0  # deadline 5+10, held trigger_count samples
    np.testing.assert_array_equal(y, expect)


def test_native_mux_window_spans_block_boundary():
    n = 16
    mux = NativeMux(latency=8, trigger_count=6)
    state = mux.init_state()
    main = S(np.zeros(n, np.float32))
    alt = S(np.ones(n, np.float32))
    # event at 6 -> window [14, 20): 2 samples this block, 4 next
    state, (o1,) = mux.apply(state, None, main, alt, _mk_events([6], n))
    state, (o2,) = mux.apply(state, None, main, alt, _mk_events([], n))
    y = np.concatenate([np.asarray(o1.data), np.asarray(o2.data)])
    expect = np.zeros(2 * n, np.float32)
    expect[14:20] = 1.0
    np.testing.assert_array_equal(y, expect)


def test_native_mux_value_substitution_cycles():
    n = 32
    mux = NativeMux(latency=4, trigger_count=2, values=[0.5, 0.9, 1.3])
    state = mux.init_state()
    main = S(np.zeros(n, np.float32))
    alt = S(np.ones(n, np.float32))
    state, (o1,) = mux.apply(state, None, main, alt, _mk_events([0], n))
    y1 = np.asarray(o1.data)
    np.testing.assert_allclose(y1[4:6], [0.5, 0.5], rtol=1e-6)
    # next activation uses the next table entry (reference d_value_index)
    state, (o2,) = mux.apply(state, None, main, alt, _mk_events([0], n))
    y2 = np.asarray(o2.data)
    np.testing.assert_allclose(y2[4:6], [0.9, 0.9], rtol=1e-6)


# -- fec_sync -----------------------------------------------------------------

def test_fec_sync_xform_odometer_order():
    x = FECSyncXform()
    ref = FECSyncXform()
    # depunc_length=2: step1 -> delay=1; step2 -> delay=0 + rotation
    more, ch = x.next(ref, 2)
    assert more and x.puncture_delay == 1
    more, ch = x.next(ref, 2)
    assert more and x.puncture_delay == 0 and CHANGE_ROTATION in ch
    assert x.rotation == 1
    more, ch = x.next(ref, 2)
    assert x.puncture_delay == 1 and x.rotation == 1
    more, ch = x.next(ref, 2)
    assert CHANGE_CONJUGATION in ch and x.conjugate is False
    # ... continues until full cycle back to ref
    more, _ = x.next(ref, 2)
    assert more
    for _ in range(3):
        more, _ = x.next(ref, 2)
    assert not more  # cycled back to ref in every dimension


def test_fec_sync_locks_and_times_out():
    clock = [0.0]
    applied = []
    fs = FECSync(lambda c, r, d, ch: applied.append((c, r, d)),
                 depunc_length=2, trial_duration=1.0, lock_timeout=5.0,
                 time_fn=lambda: clock[0])
    assert len(applied) == 1  # initial xform application
    # trials advance while unlocked
    clock[0] = 1.5
    fs.handle_clock()
    assert len(applied) == 2 and not fs.locked
    # PDU arrives -> locked at the current trial point
    fs.handle_pdu()
    assert fs.locked
    assert fs.xform_lock.puncture_delay == fs.xform_search.puncture_delay
    # clock ticks within lock_timeout keep the lock, no new trials
    clock[0] = 4.0
    fs.handle_clock()
    assert fs.locked and len(applied) == 2
    # starvation past lock_timeout -> reset + search resumes
    clock[0] = 20.0
    fs.handle_clock()
    assert not fs.locked
    assert len(applied) >= 3
    fs.handle_status()  # advisory only
    assert fs.status_count == 1 and not fs.locked


# -- compat: simple/dual usrp ---------------------------------------------------

def test_simple_and_dual_usrp_shims():
    from grbaz_tpu.compat.usrp import (dual_source_c, simple_source_c,
                                       usrp_dbid)
    s = simple_source_c(decim_rate=64) if False else simple_source_c()
    assert s.set_decim_rate(64)
    assert s.set_frequency(1e6)
    assert s.set_gain(10.0)
    assert 4 in s.get_decim_rates()
    d = dual_source_c()
    assert d.set_decim_rate(128)
    assert d.set_frequency_a(1e6) and d.set_frequency_b(2e6)
    d.start()
    x = d.read_samples(64)
    assert x.shape == (64, 2) and x.dtype == np.complex64
    d.stop()
    assert usrp_dbid.TV_RX == 0x0003


# -- LUT codegen ----------------------------------------------------------------

def test_char_luts_match_reference_formula():
    f = char_to_float_lut()
    assert f[128] == 0.0 and f[0] == -1.0
    np.testing.assert_allclose(f[255], (255 - 128) / 128.0)
    s = char_to_short_lut()
    assert s[128] == 0 and s[0] == -32768
    src = lut_c_source(f)
    assert src.startswith("{ -1.0") and src.endswith("};")
    assert src.count(",") == 255


def test_convert_u8_iq_roundtrip():
    raw = np.array([128, 128, 255, 0], np.uint8)  # (0+0j), (~1 - 1j)
    z = convert_u8_iq(raw)
    np.testing.assert_allclose(z, [0.0 + 0.0j, (127 / 128) - 1.0j])


# -- missile launcher / flipper ---------------------------------------------------

def test_missile_launcher_pointing_and_protocol():
    ml = MissileLauncher()
    ml.set_azimuth(27.0)
    assert ml.sent[0][0] == CMD_RIGHT and ml.sent[1][0] == CMD_STOP
    np.testing.assert_allclose(ml.sent[0][1], 27.0 / 270.0 * 5.5)
    ml.set_azimuth(-27.0)
    assert ml.sent[2][0] == CMD_LEFT
    ml.point_at_doa(90.0)  # broadside -> azimuth 0
    assert ml.azimuth == 0.0
    assert ml.launch() and ml.sent[-1][0] == CMD_FIRE
    ml.set_azimuth(500.0)  # clamps to +135
    assert ml.azimuth == 135.0


def test_view_flipper_ticks():
    hits = []
    fl = ViewFlipper(lambda: hits.append(1), interval=None)
    assert not fl.timer_running
    fl.tick()
    fl.tick()
    assert len(hits) == 2 and fl.flips == 2
    fl.start_timer(0.02)
    assert fl.timer_running
    import time
    time.sleep(0.1)
    fl.stop_timer()
    assert len(hits) >= 3
