"""Network plane loopback tests: UDP wire format, server verbs, client."""

import socket
import struct
import time

import numpy as np
import pytest

from grbaz_tpu.core.stream import stream_flags
from grbaz_tpu.net.borip_client import RemoteDevice
from grbaz_tpu.net.borip_server import BorIPServer, DEFAULT_PORT
from grbaz_tpu.net.udp import (BOR_HEADER, UDPSampleReceiver, UDPSampleSender,
                               complex_to_ishort_bytes,
                               ishort_bytes_to_complex)
import threading


def _wait(cond, timeout=5.0, dt=0.01):
    t0 = time.monotonic()
    while not cond():
        if time.monotonic() - t0 > timeout:
            return False
        time.sleep(dt)
    return True


@pytest.fixture(params=["native", "python"])
def impl(request):
    return dict(force_python=request.param == "python")


def test_udp_loopback_roundtrip(impl):
    rx = UDPSampleReceiver(port=0, bor=True, **impl)
    tx = UDPSampleSender("127.0.0.1", rx.port, bor=True, **impl)
    x = (np.exp(2j * np.pi * 0.01 * np.arange(4096)) * 0.5).astype(np.complex64)
    tx.send_complex(x)
    assert _wait(lambda: rx.stats()["packets"] >= 12)
    got, flags = rx.read_complex(len(x))
    assert len(got) == len(x)
    # i16 quantization only
    assert np.max(np.abs(got - x)) < 2e-4
    assert flags & stream_flags.STREAM_START
    assert rx.stats()["dropped"] == 0
    tx.close()
    rx.close()


def test_udp_wire_format_exact(impl):
    """The BorIP header on the wire must be {u8 flags,u8 notif,u16 seq LE}."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(2.0)
    port = sock.getsockname()[1]
    tx = UDPSampleSender("127.0.0.1", port, bor=True, payload_size=64, **impl)
    tx.send_bytes(b"\x11" * 100)  # 2 packets: 64 + 36
    p1, _ = sock.recvfrom(2048)
    p2, _ = sock.recvfrom(2048)
    f1, n1, i1 = BOR_HEADER.unpack(p1[:4])
    f2, n2, i2 = BOR_HEADER.unpack(p2[:4])
    assert f1 & stream_flags.STREAM_START
    assert i2 == (i1 + 1) & 0xFFFF
    assert len(p1) == 4 + 64 and len(p2) == 4 + 36
    assert p1[4:] == b"\x11" * 64
    tx.close()
    sock.close()


def test_udp_drop_detection(impl):
    """Skipping a seq number must raise dropped count + NETWORK_OVERRUN."""
    rx = UDPSampleReceiver(port=0, bor=True, **impl)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dest = ("127.0.0.1", rx.port)
    payload = b"\x00" * 16
    sock.sendto(BOR_HEADER.pack(stream_flags.STREAM_START, 0, 0) + payload, dest)
    sock.sendto(BOR_HEADER.pack(0, 0, 1) + payload, dest)
    sock.sendto(BOR_HEADER.pack(0, 0, 4) + payload, dest)  # 2,3 lost
    assert _wait(lambda: rx.stats()["packets"] >= 3)
    data, flags = rx.read_bytes(4096)
    assert rx.stats()["dropped"] == 2
    assert flags & stream_flags.NETWORK_OVERRUN
    rx.close()
    sock.close()


def test_udp_ata_mode(impl):
    """ATA dialect: 64-byte header, u32 seq, stream metadata carried."""
    from grbaz_tpu.net.udp import ATA_HEADER, MODE_ATA
    rx = UDPSampleReceiver(port=0, mode=MODE_ATA, **impl)
    tx = UDPSampleSender("127.0.0.1", rx.port, mode=MODE_ATA,
                         payload_size=256, **impl)
    tx.set_ata_meta(freq=1.42e9, rate=104.8576e6, chan=7)
    tx.send_bytes(b"\xab" * 600)  # 3 packets: 256+256+88
    assert _wait(lambda: rx.stats()["packets"] >= 3)
    data, flags = rx.read_bytes(4096)
    assert data == b"\xab" * 600
    assert rx.stats()["dropped"] == 0
    info = rx.ata_info()
    assert info["freq"] == pytest.approx(1.42e9)
    assert info["sample_rate"] == pytest.approx(104.8576e6)
    # now a raw-socket gap: jump the 32-bit seq counter
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    hdr = ATA_HEADER.pack(0, 1, 16, 0, 0, 0, 1, 0, 64, 0, 7, 100,
                          1.42e9, 104.8576e6, 1.0, 0.0, 12345, 0, 16)
    sock.sendto(hdr + b"\x00" * 16, ("127.0.0.1", rx.port))
    assert _wait(lambda: rx.stats()["packets"] >= 4)
    _, flags = rx.read_bytes(4096)
    assert rx.stats()["dropped"] > 0
    assert flags & stream_flags.NETWORK_OVERRUN
    tx.close()
    rx.close()
    sock.close()


def test_udp_ata_wire_format_exact(impl):
    """ATA header must be the 64-byte packed layout with u32 seq/len."""
    from grbaz_tpu.net.udp import ATA_HEADER, MODE_ATA
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(2.0)
    port = sock.getsockname()[1]
    tx = UDPSampleSender("127.0.0.1", port, mode=MODE_ATA,
                         payload_size=128, **impl)
    tx.set_ata_meta(freq=100e6, rate=2e6, item_bytes=4)
    tx.send_bytes(b"\x22" * 200)  # 2 packets: 128 + 72
    p1, _ = sock.recvfrom(4096)
    p2, _ = sock.recvfrom(4096)
    assert len(p1) == 64 + 128 and len(p2) == 64 + 72
    h1 = ATA_HEADER.unpack(p1[:64])
    h2 = ATA_HEADER.unpack(p2[:64])
    # (seq, freq, rate, absTime, len) positions: 11, 12, 13, 16, 18
    assert h1[11] == 0 and h2[11] == 1
    assert h1[12] == pytest.approx(100e6) and h1[13] == pytest.approx(2e6)
    assert h1[16] == 0 and h2[16] == 128 // 4  # absTime advances in items
    assert h1[18] == 128 and h2[18] == 72
    assert p1[64:] == b"\x22" * 128
    tx.close()
    sock.close()


def test_ishort_conversion_roundtrip():
    x = (np.random.default_rng(0).standard_normal(256)
         + 1j * np.random.default_rng(1).standard_normal(256)).astype(np.complex64)
    x = np.clip(x.real, -1, 1) + 1j * np.clip(x.imag, -1, 1)
    x = x.astype(np.complex64)
    back = ishort_bytes_to_complex(complex_to_ishort_bytes(x))
    assert np.max(np.abs(back - x)) < 1e-4


@pytest.fixture
def server():
    srv = BorIPServer(("127.0.0.1", 0))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_server_verbs_and_streaming(server):
    dev = RemoteDevice("127.0.0.1", server.port, udp_port=0, keepalive=False)
    info = dev.select_device("synth tone_offset=5000 rate=100000 realtime=0")
    assert info["name"] == "Synthetic"
    assert info["serial"] == "SYN0001"
    assert info["gain_max"] == 30.0
    # control verbs
    assert dev.set_freq(1.234e6)
    assert dev.set_gain(10.0)
    rate = dev.set_sample_rate(100e3)
    assert rate == 100e3
    assert dev.set_antenna("SYNTH")
    assert dev.command("PING").startswith("PONG")
    # unknown verb
    assert dev.command("BOGUS") == "UNKNOWN"
    # start the sample plane and pull samples
    assert dev.start()
    x = dev.wait_samples(16384, timeout=10.0)
    # the tone must be present at 5 kHz / 100 kHz = 0.05
    spec = np.abs(np.fft.fft(x * np.hanning(len(x))))
    f = np.argmax(spec) / len(x)
    assert abs(f - 0.05) < 1e-3
    dev.stop()
    dev.close()


def test_server_verbs_without_device(server):
    dev = RemoteDevice("127.0.0.1", server.port, udp_port=0, keepalive=False)
    # no device selected: control verbs answer DEVICE
    assert dev.command("FREQ 1e6") == "DEVICE"
    assert dev.command("GO") == "DEVICE"
    # DEVICE with bad hint reports failure, connection stays up
    resp = dev.command("DEVICE nosuchdevice")
    assert resp.startswith("-")
    assert dev.command("PING").startswith("PONG")
    dev.close()


def test_server_device_teardown_on_disconnect(server):
    dev = RemoteDevice("127.0.0.1", server.port, udp_port=0, keepalive=False)
    dev.select_device("synth realtime=0")
    dev.start()
    dev.close()
    # server must keep accepting new clients after abrupt disconnect
    dev2 = RemoteDevice("127.0.0.1", server.port, udp_port=0, keepalive=False)
    assert dev2.command("PING").startswith("PONG")
    dev2.close()


def test_tcp_frames_with_tags():
    from grbaz_tpu.net.tcp import TCPFrameSink, TCPFrameSource
    src = TCPFrameSource(port=0, dtype=np.complex64)
    sink = TCPFrameSink("127.0.0.1", src.port)
    x1 = (np.arange(100) + 1j).astype(np.complex64)
    x2 = (np.arange(50) * 2.0).astype(np.complex64)
    assert sink.send_samples(x1, tags=[{"offset": 0, "key": "rx_time",
                                        "value": [12, 0.5]}])
    assert sink.send_samples(x2)
    sink.end_stream()

    def drain():
        frames = []
        t0 = time.monotonic()
        while len(frames) < 2 and time.monotonic() - t0 < 5:
            d, tags = src.read()
            if len(d):
                frames.append((d, tags))
            else:
                time.sleep(0.01)
        return frames

    frames = drain()
    assert len(frames) == 2
    d1, t1 = frames[0]
    np.testing.assert_array_equal(d1, x1)
    assert t1[0]["key"] == "rx_time" and t1[0]["value"] == [12, 0.5]
    d2, t2 = frames[1]
    np.testing.assert_array_equal(d2, x2)
    assert t2 == []
    assert _wait(lambda: src.stream_ended())
    sink.close()
    src.close()


def test_tcp_source_accepts_reconnect():
    from grbaz_tpu.net.tcp import TCPFrameSink, TCPFrameSource
    src = TCPFrameSource(port=0, dtype=np.float32)
    s1 = TCPFrameSink("127.0.0.1", src.port)
    s1.send_samples(np.ones(10, np.float32))
    s1.close()
    time.sleep(0.3)
    s2 = TCPFrameSink("127.0.0.1", src.port)  # second client after first left
    s2.send_samples(np.full(5, 2.0, np.float32))
    t0 = time.monotonic()
    seen = []
    while len(seen) < 2 and time.monotonic() - t0 < 5:
        d, _ = src.read()
        if len(d):
            seen.append(d)
        time.sleep(0.01)
    assert len(seen) == 2
    np.testing.assert_array_equal(seen[1], np.full(5, 2.0, np.float32))
    s2.close()
    src.close()


# ---------------------------------------------------------------------------
# native TCP frame engine (C++ tcpframe.cc) <-> Python protocol layer
# ---------------------------------------------------------------------------

def test_native_tcp_sink_to_native_source():
    import time
    from grbaz_tpu.net.tcp import NativeTCPFrameSink, NativeTCPFrameSource

    src = NativeTCPFrameSource(port=0, dtype=np.complex64)
    sink = NativeTCPFrameSink("127.0.0.1", src.port)
    x1 = (np.arange(100) + 1j).astype(np.complex64)
    x2 = (np.arange(100, 300) - 2j).astype(np.complex64)
    assert sink.send_samples(x1, tags=[{"offset": 0, "tags": {"rx_freq": 100e6}}])
    assert sink.send_samples(x2)
    sink.end_stream()

    got, tags = [], []
    deadline = time.time() + 5
    while time.time() < deadline and (sum(len(g) for g in got) < 300
                                      or not src.stream_ended()):
        s, t = src.read()
        if len(s):
            got.append(s)
        tags.extend(t)
        time.sleep(0.01)
    y = np.concatenate(got) if got else np.zeros(0, np.complex64)
    np.testing.assert_array_equal(y, np.concatenate([x1, x2]))
    assert any(t.get("tags", {}).get("rx_freq") == 100e6 for t in tags)
    assert src.stream_ended()
    st = src.stats()
    assert st["frames"] == 2 and st["bytes"] == 300 * 8
    sink.close()
    src.close()


def test_native_tcp_interop_with_python_layer():
    """Python TCPFrameSink -> native source, and native sink -> Python
    TCPFrameSource: both directions speak the same wire format."""
    import time
    from grbaz_tpu.net.tcp import (NativeTCPFrameSink, NativeTCPFrameSource,
                                   TCPFrameSink, TCPFrameSource)

    # python -> native
    nsrc = NativeTCPFrameSource(port=0, dtype=np.float32)
    psink = TCPFrameSink("127.0.0.1", nsrc.port)
    x = np.linspace(0, 1, 257, dtype=np.float32)
    assert psink.send_samples(x, tags=[{"offset": 3, "tags": {"k": "v"}}])
    got, tags = [], []
    deadline = time.time() + 5
    while time.time() < deadline and sum(len(g) for g in got) < len(x):
        s, t = nsrc.read()
        if len(s):
            got.append(s)
        tags.extend(t)
        time.sleep(0.01)
    np.testing.assert_array_equal(np.concatenate(got), x)
    assert tags and tags[0]["tags"] == {"k": "v"}
    psink.close()
    nsrc.close()

    # native -> python
    psrc = TCPFrameSource(port=0, dtype=np.float32)
    nsink = NativeTCPFrameSink("127.0.0.1", psrc.port)
    assert nsink.send_samples(x, tags=[{"offset": 0, "tags": {"q": 7}}])
    deadline = time.time() + 5
    while time.time() < deadline:
        s, t = psrc.read()
        if len(s):
            np.testing.assert_array_equal(s, x)
            assert t and t[0]["tags"] == {"q": 7}
            break
        time.sleep(0.01)
    else:
        raise AssertionError("python source never got the native frame")
    nsink.close()
    psrc.close()


def test_native_tcp_sink_reconnect():
    import time
    from grbaz_tpu.net.tcp import NativeTCPFrameSink, NativeTCPFrameSource

    src = NativeTCPFrameSource(port=0, dtype=np.float32)
    port = src.port
    sink = NativeTCPFrameSink("127.0.0.1", port, auto_reconnect=True)
    x = np.ones(16, np.float32)
    assert sink.send_samples(x)
    time.sleep(0.2)
    src.close()  # drop the receiver
    time.sleep(0.2)
    sink.send_samples(x)  # fails (maybe after a buffered success)
    time.sleep(0.2)
    for _ in range(5):
        if not sink.send_samples(x):
            break
        time.sleep(0.1)
    # bring a new receiver up on the same port; sink must reconnect
    src2 = NativeTCPFrameSource(port=port, dtype=np.float32)
    deadline = time.time() + 5
    ok = False
    while time.time() < deadline and not ok:
        ok = sink.send_samples(x)
        time.sleep(0.1)
    assert ok, "sink never reconnected"
    deadline = time.time() + 5
    while time.time() < deadline:
        s, _ = src2.read()
        if len(s):
            np.testing.assert_array_equal(s, x)
            break
        time.sleep(0.05)
    else:
        raise AssertionError("no data after reconnect")
    sink.close()
    src2.close()


def test_usrp_shim_transparent_borip_fallback(monkeypatch):
    """A bare legacy ``usrp.source_c()`` silently becomes a remote BorIP
    device when [borip] server is configured — the reference's
    monkey-patch fallback (python/borip.py:561-573)."""
    srv = BorIPServer(("127.0.0.1", 0),
                      default_device="synth rate=100000 realtime=0")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv("GRBAZ_BORIP_SERVER",
                           f"127.0.0.1:{srv.server_address[1]}")
        from grbaz_tpu.compat import usrp
        u = usrp.source_c(decim_rate=640)  # 64 MHz / 640 = 100 kS/s
        assert type(u._dev).__name__ == "BorIPRemoteDevice"
        assert u.adc_freq() == 64e6
        sub = u.pick_rx_subdevice() if hasattr(u, "pick_rx_subdevice") \
            else None
        tr = u.tune(0, u.selected_subdev((0, 0)), 1.5e6)
        assert tr is not None
        # streaming: samples arrive over the BorIP UDP plane
        assert u._dev.start()
        x = u._dev.read_samples(256)
        assert len(x) == 256 and x.dtype == np.complex64
        u._dev.close()
    finally:
        srv.shutdown()
        srv.server_close()
