"""App smoke tests: each CLI runs end-to-end on synthetic input."""

import json
import os

import numpy as np
import pytest


def test_control_loop_calc(capsys):
    from grbaz_tpu.apps.control_loop_calc import (alpha_beta_to_bw_damping,
                                                  bw_damping_to_alpha_beta,
                                                  main)
    # roundtrip: bw/damping -> alpha/beta -> bw/damping
    a, b = bw_damping_to_alpha_beta(0.0628, 0.707)
    bw, d = alpha_beta_to_bw_damping(a, b)
    assert bw == pytest.approx(0.0628, rel=1e-6)
    assert d == pytest.approx(0.707, rel=1e-6)
    assert main(["-l", "0.0628", "-d", "0.707"]) == 0
    out = capsys.readouterr().out
    assert "Alpha" in out and "Beta" in out
    assert main([]) == 1  # no args -> usage error


def test_papr_app(tmp_path, capsys):
    from grbaz_tpu.apps.papr import main
    csv = tmp_path / "ccdf.csv"
    assert main(["--csv", str(csv)]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # pulse-shaped QPSK: PAPR meaningfully above 0 dB
    assert 2.0 < rep["papr_db"] < 12.0
    rows = csv.read_text().splitlines()
    assert rows[0] == "db_above_avg,prob"
    assert len(rows) > 40


def test_papr_file_formats(tmp_path):
    from grbaz_tpu.apps.papr import load_iq
    x = (np.exp(2j * np.pi * 0.01 * np.arange(256))).astype(np.complex64)
    p = tmp_path / "iq.c64"
    x.tofile(p)
    got = load_iq(str(p), "c64")
    assert np.allclose(got, x)
    raw = np.empty(512, np.int8)
    raw[0::2] = np.round(x.real * 100)
    raw[1::2] = np.round(x.imag * 100)
    p2 = tmp_path / "iq.c8"
    raw.tofile(p2)
    got = load_iq(str(p2), "c8", trim=100)
    assert len(got) == 100


def test_fac_app(tmp_path, capsys):
    from grbaz_tpu.apps.fac import main
    png = tmp_path / "fac.png"
    assert main(["--frames", "4", "--png", str(png)]) == 0
    out = capsys.readouterr().out
    # 5 kHz pulse train at 250 kS/s: autocorrelation peaks at lag 50
    # and its multiples (all comb harmonics tie up to noise)
    bin_ = int(out.split("strongest correlation at bin")[1].split()[0])
    assert bin_ % 50 == 0 and bin_ > 0, out
    assert png.read_bytes()[:4] == b"\x89PNG"


def test_am_fft_app(tmp_path, capsys):
    from grbaz_tpu.apps.am_fft import main
    wav = tmp_path / "am.wav"
    assert main(["--blocks", "4", "-f", "100e3", "-o", str(wav)]) == 0
    assert wav.read_bytes()[:4] == b"RIFF"
    # the demodulated tone must be present: read wav payload, FFT peak ~1 kHz
    import struct
    data = wav.read_bytes()
    pcm = np.frombuffer(data[44:], np.int16).astype(np.float32) / 32767.0
    pcm = pcm[len(pcm) // 2:]
    spec = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    rate = struct.unpack("<I", data[24:28])[0]
    peak_hz = (np.argmax(spec[3:]) + 3) * rate / len(pcm)
    assert abs(peak_hz - 1000.0) < 60.0


def test_gpsdo_app(capsys, tmp_path):
    from grbaz_tpu.apps.gpsdo import main, parse_gps_servo
    fifo = tmp_path / "gps.txt"
    assert main(["-n", "6", "-i", "0.01", "-f", str(fifo)]) == 0
    out = capsys.readouterr().out
    assert "lock state -> Locked, and GPS active" in out
    assert "health -> healthy" in out
    assert "drift:" in out and "lock transitions" in out
    assert len(fifo.read_text().strip().splitlines()) == 6

    servo = parse_gps_servo("40000 31873.2 -4.5 2.1e-12 11 9 5 0x14")
    assert servo["lock_state_str"].startswith("Holdover, but still")
    assert servo["sats_visible"] == 11 and servo["sats_tracked"] == 9
    assert "GPS in holdover > 60 s" in servo["health_flags"]
    assert "phase offset to UTC > 250 ns" in servo["health_flags"]


def test_pps_diff_app(capsys):
    from grbaz_tpu.apps.pps_diff import main
    assert main(["-n", "5"]) == 0
    out = capsys.readouterr().out
    assert out.count("diff") >= 5
    assert "drift" in out
