"""Small-utility parity: colours, flusher, run_remote, acars formatting,
event->message bridge, device plugin import."""

import queue

import numpy as np
import pytest


def test_colourise():
    from grbaz_tpu.utils.term import colourise, colours
    s = colourise("hi", "red", "bold")
    assert s.startswith(colours["red"] + colours["bold"])
    assert s.endswith(colours["reset"])
    assert colourise("hi", "red", enable=False) == "hi"


def test_std_flusher():
    from grbaz_tpu.utils.term import StdFlusher
    f = StdFlusher(interval=0.01)
    import time
    time.sleep(0.05)
    f.stop()  # no exceptions = pass; thread must terminate
    assert f._thr is None


def test_run_remote_argv_and_lifecycle():
    from grbaz_tpu.utils.run_remote import RunRemote

    spawned = {}

    class FakeProc:
        def __init__(self, argv):
            spawned["argv"] = argv
            self.terminated = False

        def poll(self):
            return None

        def terminate(self):
            self.terminated = True

        def wait(self, timeout=None):
            return 0

    r = RunRemote("radio1", "rtl_fm --synth", user="op", forward_x=True,
                  ssh_args="-o BatchMode=yes", spawn=FakeProc)
    assert spawned["argv"][:4] == ["ssh", "-p", "22", "-X"]
    assert "op@radio1" in spawned["argv"]
    assert spawned["argv"][-1] == "rtl_fm --synth"
    r.stop()


def test_acars_format():
    from grbaz_tpu.utils.acars import format_packet, parse_packet
    # assemble a synthetic ACARS packet: SOH mode addr7 ack label2 bid STX
    # seq4 flight6 text ETX
    body = (b"\x01" + b"2" + b".N12345" + b"\x15" + b"H1" + b"4"
            + b"\x02" + b"M04A" + b"UA1234" + b"HELLO WORLD" + b"\x03")
    row = np.zeros(2 + 252, np.float32)
    row[0] = len(body)
    row[1] = 0
    row[2:2 + len(body)] = np.frombuffer(body, np.uint8)
    f = parse_packet(row)
    assert f["mode"] == "2" and f["address"] == "N12345"
    assert f["ack"] == "NAK" and f["label"] == "H1"
    assert f["flight"] == "UA1234" and f["message"] == "HELLO WORLD"
    line = format_packet(row)
    assert "addr=N12345" in line and "HELLO WORLD" in line


def test_event_to_message():
    from grbaz_tpu.net.message_server import EventToMessage
    q = queue.Queue()
    bridge = EventToMessage(q, appendix=" via radar")
    ev = np.array([[1, 2.5], [3, 4.5], [0, 0]], np.float32)
    n = bridge.post(ev, count=2)
    assert n == 2
    assert q.get_nowait().endswith(" via radar")
    assert "4.5" in q.get_nowait()
    assert q.empty()


def test_borip_plugin_import(tmp_path, monkeypatch):
    """A module named borip_<hint> self-registers its device on import."""
    import sys
    mod = tmp_path / "borip_fakeradio.py"
    mod.write_text(
        "from grbaz_tpu.net.devices import DEVICE_REGISTRY, SyntheticDevice\n"
        "class FakeRadio(SyntheticDevice):\n"
        "    def name(self):\n"
        "        return 'FakeRadio9000'\n"
        "DEVICE_REGISTRY['fakeradio'] = FakeRadio\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    from grbaz_tpu.net.devices import create_device
    d = create_device("fakeradio tone_offset=5000")
    assert d.name() == "FakeRadio9000"
    d.close()
    sys.modules.pop("borip_fakeradio", None)


def test_gpsdo_monitor():
    from grbaz_tpu.net.hw_control import GPSDOMonitor
    t = [1000.0]
    state = dict(locked=False)

    def sensors():
        # gps time runs 1 ppm fast relative to host
        return dict(gps_time=t[0] * (1 + 1e-6), gps_locked=state["locked"],
                    ref_locked=True)

    mon = GPSDOMonitor(sensors, now=lambda: t[0])
    for i in range(10):
        if i == 3:
            state["locked"] = True
        mon.sample()
        t[0] += 1.0
    # drift: 1 ppm of 1 s interval = 1e-6 s/sample
    assert mon.drift() == pytest.approx(1e-6, rel=0.05)
    kinds = [(k, v) for _, k, v in mon.lock_transitions]
    assert ("gps_locked", False) in kinds   # first sample records state
    assert ("gps_locked", True) in kinds    # the lock transition
    assert len(mon.history) == 10


def test_config_layer(tmp_path, monkeypatch):
    from grbaz_tpu.core.config import BorIPConfig, load_config
    conf = tmp_path / "config.conf"
    conf.write_text("[borip]\nserver = radio.local:1234\n"
                    "reconnect_attempts = 7\nverbose = yes\n")
    monkeypatch.setenv("GRBAZ_CONFIG", str(conf))
    cfg = load_config(BorIPConfig, "borip")
    assert cfg.server == "radio.local:1234"
    assert cfg.reconnect_attempts == 7 and cfg.verbose is True
    assert cfg.keepalive_interval == 5.0  # schema default
    # env override beats the file; kwargs beat both
    monkeypatch.setenv("GRBAZ_BORIP_RECONNECT_ATTEMPTS", "3")
    cfg = load_config(BorIPConfig, "borip")
    assert cfg.reconnect_attempts == 3
    cfg = load_config(BorIPConfig, "borip", reconnect_attempts=9)
    assert cfg.reconnect_attempts == 9
