"""Misc blocks + observability plane + hardware controllers."""

import socket
import time

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.net.devices import SyntheticDevice
from grbaz_tpu.net.hw_control import (FreqHopper, SoftwareAGC, delayed_start,
                                      finite_acquisition)
from grbaz_tpu.net.message_server import MessageServer
from grbaz_tpu.ops.misc import (BlockStatus, FastrakDecoder, FieldTracker,
                                MatrixInterleaver, SwapFF, TestCounter,
                                _crc16_ccitt_update)


def S(x, rate=1.0):
    return Stream.full(jnp.asarray(x), meta=StreamMeta.start(rate))


def test_matrix_interleaver_transpose():
    vi, vo = 4, 3
    rows = np.arange(vo * vi, dtype=np.float32).reshape(vo, vi)
    blk = MatrixInterleaver(vi, vo, dtype=jnp.float32)
    st, (out,) = blk.apply(None, None, S(rows))
    cols = np.asarray(out.data)
    assert int(out.count) == vi
    np.testing.assert_array_equal(cols, rows.T)


def crc16_host(data_bytes):
    crc = 0
    for b in data_bytes:
        t = ((crc >> 8) ^ b) & 0xFF
        t ^= t >> 4
        crc = ((crc << 8) ^ (t << 12) ^ (t << 5) ^ t) & 0xFFFF
    return crc


def test_fastrak_decodes_id():
    os_ = 4
    tag_id = 0x12345678
    # frame bits: 12-bit sync 0xAAC + 16-bit type 0x0001 + 32-bit ID + CRC16
    bits = [int(b) for b in f"{0xAAC:012b}"]
    body = [int(b) for b in f"{0x0001:016b}"] \
        + [int(b) for b in f"{tag_id:032b}"]
    # CRC over body bytes (type+ID = 6 bytes); transmitted so crc==0:
    body_bytes = []
    acc = 0
    for i, b in enumerate(body):
        acc = (acc << 1) | b
        if (i + 1) % 8 == 0:
            body_bytes.append(acc)
            acc = 0
    crc = crc16_host(body_bytes)
    crc_bits = [int(b) for b in f"{crc:016b}"]
    frame = bits + body + crc_bits
    # oversample; bit metric +-1; sync pulse at frame start
    metric = np.repeat(np.array(frame, np.float32) * 2 - 1, os_)
    sig = np.concatenate([-np.ones(50, np.float32), metric,
                          -np.ones(50, np.float32)])
    sync = np.zeros_like(sig)
    sync[50] = 5.0
    dec = FastrakDecoder(sync_threshold=1.0, oversampling=os_)
    st, (ev,) = dec.apply(dec.init_state(), dec.init_params(),
                          S(sig), S(sync))
    assert int(ev.count) == 1, int(ev.count)
    row = np.asarray(ev.data)[0]
    got_id = (int(row[0]) << 16) | int(row[1])
    assert got_id == tag_id
    assert int(row[2]) == 1
    # same tag again increments last_id_count
    st, (ev2,) = dec.apply(st, dec.init_params(), S(sig), S(sync))
    assert int(np.asarray(ev2.data)[0, 2]) == 2


def test_fastrak_rejects_bad_crc():
    os_ = 4
    bits = [int(b) for b in f"{0xAAC:012b}"] \
        + [int(b) for b in f"{0x0001:016b}"] \
        + [int(b) for b in f"{0xDEADBEEF:032b}"] \
        + [0] * 16  # wrong CRC
    metric = np.repeat(np.array(bits, np.float32) * 2 - 1, os_)
    sig = np.concatenate([-np.ones(20, np.float32), metric])
    sync = np.zeros_like(sig)
    sync[20] = 5.0
    dec = FastrakDecoder(sync_threshold=1.0, oversampling=os_)
    st, (ev,) = dec.apply(dec.init_state(), dec.init_params(),
                          S(sig), S(sync))
    assert int(ev.count) == 0


def test_test_counter_detects_drops():
    tc = TestCounter()
    st = tc.init_state()
    st, _ = tc.apply(st, None, S(np.arange(0, 100, dtype=np.float32)))
    st, _ = tc.apply(st, None, S(np.arange(100, 200, dtype=np.float32)))
    assert int(st["errors"]) == 0
    st, _ = tc.apply(st, None, S(np.arange(250, 350, dtype=np.float32)))
    assert int(st["errors"]) == 1  # the 200->250 jump


def test_swap_ff():
    blk = SwapFF(swap=True)
    x = np.array([1, 2, 3, 4], np.float32)
    st, (y,) = blk.apply(None, blk.init_params(), S(x))
    np.testing.assert_array_equal(np.asarray(y.data), [2, 1, 4, 3])
    st, (y2,) = blk.apply(None, dict(swap=np.bool_(False)), S(x))
    np.testing.assert_array_equal(np.asarray(y2.data), x)


def test_field_tracker_parity():
    n = 100
    sig = np.zeros(n, np.float32)
    even = np.zeros(n, np.float32)
    odd = np.zeros(n, np.float32)
    even[10] = 1.0
    odd[60] = 1.0
    ft = FieldTracker()
    st, (out, par) = ft.apply(ft.init_state(), ft.init_params(),
                              S(sig), S(even), S(odd))
    p = np.asarray(par.data)
    assert np.all(p[10:60] == 1.0)
    assert np.all(p[60:] == -1.0)


def test_block_status_fires_on_interval():
    bs = BlockStatus(interval=256)
    st = bs.init_state()
    st, (x1, r1) = bs.apply(st, None, S(np.zeros(128, np.float32)))
    assert int(r1.count) == 0
    st, (x2, r2) = bs.apply(st, None, S(np.zeros(128, np.float32)))
    assert int(r2.count) == 1
    rep = np.asarray(r2.data)[0]
    assert rep[0] == 256 and rep[1] == 2


def test_message_server_broadcast():
    srv = MessageServer(("127.0.0.1", 0))
    c1 = socket.create_connection(("127.0.0.1", srv.port), 2)
    c2 = socket.create_connection(("127.0.0.1", srv.port), 2)
    time.sleep(0.2)
    n = srv.post("radar pulse start=123 len=40")
    assert n == 2
    for c in (c1, c2):
        c.settimeout(2)
        assert c.recv(100) == b"radar pulse start=123 len=40\n"
    c1.close()
    time.sleep(0.2)
    assert srv.post("second") >= 1
    c2.close()
    srv.close()


def test_control_server_xmlrpc():
    from xmlrpc.client import ServerProxy
    from grbaz_tpu.net.control_server import ControlServer

    class Holder:
        params = {"resampler": dict(inc_int=np.int32(5),
                                    inc_frac=np.uint32(123))}

    h = Holder()
    cs = ControlServer(h, ("127.0.0.1", 0))
    cli = ServerProxy(f"http://127.0.0.1:{cs.port}")
    assert cli.list_params() == {"resampler": ["inc_frac", "inc_int"]}
    assert cli.get_param("resampler", "inc_int") == 5
    cli.set_resampler_inc_int(7)
    assert int(h.params["resampler"]["inc_int"]) == 7
    assert h.params["resampler"]["inc_int"].dtype == np.int32
    cs.close()


def test_freq_hopper_and_agc_and_acquire():
    tuned = []
    hopper = FreqHopper(tuned.append, [1e6, 2e6, 3e6], dwell=0.01,
                        drop_length=100, drop_callback=lambda n: None)
    for _ in range(5):
        hopper.hop()
    assert tuned == [1e6, 2e6, 3e6, 1e6, 2e6]

    gains = []
    agc = SoftwareAGC(gains.append, gain=10.0, target=0.5, hold_time=0.0)
    agc.feed(0.9)   # too hot -> step down
    agc.feed(0.96)  # saturated -> big backoff
    agc.feed(0.1)   # too cold -> step up
    assert gains == [9.0, 6.0, 7.0]

    dev = SyntheticDevice(tone_offset=1000.0, rate=100e3, realtime=False,
                          noise=0.0)
    x = finite_acquisition(dev, 5000, skip=100)
    assert len(x) == 5000 and not dev.is_running()
    spec = np.abs(np.fft.fft(x))
    assert abs(np.argmax(spec) / len(x) - 0.01) < 1e-3


def test_delayed_start_alignment():
    fake_now = [99.7]

    def clock():
        return fake_now[0]

    def sleeper(dt):
        fake_now[0] += dt

    t = delayed_start(offset=0.25, clock=clock, sleeper=sleeper)
    assert t == 100.25
    assert abs(fake_now[0] - 100.25) < 0.02
