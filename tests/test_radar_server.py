"""Radar server: sweep protocol, report packing, TSF rollover unwrap."""

import base64
import socket
import time

import numpy as np

from grbaz_tpu.net.radar_server import (REPORT, RadarReportQueue, RadarServer,
                                        TSF_ROLLOVER, pack_detector_events,
                                        unpack_reports)


class FakeRadar:
    def __init__(self):
        self.freqs = []
        self.params = {}

    def set_freq(self, mhz):
        self.freqs.append(mhz)
        return True

    def set_param(self, name, value):
        self.params[name] = value


def _readlines(sock, n, timeout=10.0):
    sock.settimeout(timeout)
    buf = b""
    lines = []
    while len(lines) < n:
        chunk = sock.recv(4096)
        if not chunk:
            break
        buf += chunk
        while b"\n" in buf and len(lines) < n:
            line, buf = buf.split(b"\n", 1)
            lines.append(line.decode())
    return lines


def test_sweep_protocol_and_reports():
    radar = FakeRadar()
    q = RadarReportQueue()
    srv = RadarServer(radar, port=0, report_queue=q, detector=radar)
    try:
        c = socket.create_connection(("127.0.0.1", srv.port))
        # detector param verbs route through set_param
        c.sendall(b"RSSI 34\nPHEIGHT 12\n")
        # reports that the dwell should pick up
        q.insert(REPORT.pack(100, 50, 3, 0, 0))
        q.insert(REPORT.pack(200, 60, 4, 0, 0))
        c.sendall(b"START 100 110 5 0.05\n")
        # sweep: 100, 105, 110 -> 3 DATA lines then END
        lines = _readlines(c, 4)
        assert [l.split()[0] for l in lines] == ["DATA"] * 3 + ["END"]
        freqs = [int(l.split()[1]) for l in lines[:3]]
        assert freqs == [100, 105, 110]
        assert radar.freqs[:3] == [100, 105, 110]
        assert radar.params == {"RSSI": 34, "PHEIGHT": 12}
        # reports inserted before the first dwell arrive in some DATA line
        # (first dwell clears on tune; re-inserted data shows up after)
        c.close()
    finally:
        srv.stop()


def test_fixed_freq_command():
    radar = FakeRadar()
    srv = RadarServer(radar, port=0)
    try:
        c = socket.create_connection(("127.0.0.1", srv.port))
        c.sendall(b"FREQ 5260\n")
        (line,) = _readlines(c, 1)
        assert line == "FREQ 5260"
        assert radar.freqs == [5260]
        c.close()
    finally:
        srv.stop()


def test_data_payload_roundtrip():
    radar = FakeRadar()
    q = RadarReportQueue()
    srv = RadarServer(radar, port=0, report_queue=q)
    try:
        c = socket.create_connection(("127.0.0.1", srv.port))
        time.sleep(0.1)
        raw = REPORT.pack(1234, 77, 9, 1, 2)
        # single-frequency sweep: start==stop -> one DATA then END
        c.sendall(b"START 5000 5000 5 0.3\n")
        time.sleep(0.1)  # after tune+clear, inside the dwell
        q.insert(raw)
        lines = _readlines(c, 2)
        assert lines[0].startswith("DATA 5000 ")
        payload = base64.b64decode(lines[0].split()[2])
        assert payload == raw
        reps = unpack_reports(payload)
        assert reps[0].tsf == 1234 and reps[0].rssi == 77
        assert reps[0].width == 9 and reps[0].type == 1
        c.close()
    finally:
        srv.stop()


def test_tsf_rollover_unwrap():
    """Reports wrapping the 15-bit TSF must unwrap monotonically."""
    data = (REPORT.pack(30000, 1, 1, 0, 0)
            + REPORT.pack(100, 2, 1, 0, 0)      # rolled over
            + REPORT.pack(200, 3, 1, 0, 0))
    reps = unpack_reports(data)
    # earlier reports are shifted down by the rollover amount
    assert reps[0].tsf == 30000 - TSF_ROLLOVER
    assert reps[1].tsf == 100 and reps[2].tsf == 200
    assert reps[0].tsf < reps[1].tsf < reps[2].tsf


def test_pack_detector_events():
    data = pack_detector_events(starts=[1000], lengths=[5], maxima=[0.1],
                                sample_rate=1e6)
    reps = unpack_reports(data)
    assert reps[0].tsf == 1000  # 1000 samples @ 1 MHz = 1000 us
    assert reps[0].width == 5
    assert reps[0].rssi == 90  # 10log10(0.1)+100
