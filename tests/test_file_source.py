"""File source: WAV+auxi parsing, timing-file gap padding, playlist, seek."""

import struct

import numpy as np
import pytest

from grbaz_tpu.core.stream import stream_flags
from grbaz_tpu.io.file_source import _AUXI, CaptureFile, FileSource


def make_wav(path, iq, rate=250000, freq=100e6, with_auxi=True):
    """Write a 16-bit stereo (IQ) WAV with an optional SpectraVue auxi."""
    i16 = np.empty(2 * len(iq), np.int16)
    i16[0::2] = np.round(iq.real * 32767)
    i16[1::2] = np.round(iq.imag * 32767)
    data = i16.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    chunks = [(b"fmt ", fmt)]
    if with_auxi:
        st = (2024, 3, 0, 15, 12, 30, 45, 500)
        et = (2024, 3, 0, 15, 12, 31, 45, 0)
        auxi = _AUXI.pack(*st, *et, int(freq), b"\x00" * 24, 0)
        chunks.append((b"auxi", auxi))
    chunks.append((b"data", data))
    body = b"WAVE"
    for cid, blob in chunks:
        body += cid + struct.pack("<I", len(blob)) + blob
        if len(blob) % 2:
            body += b"\x00"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_auxi_parsing(tmp_path):
    iq = (np.exp(2j * np.pi * 0.05 * np.arange(1000)) * 0.5).astype(np.complex64)
    p = tmp_path / "cap.wav"
    make_wav(str(p), iq, rate=192000, freq=98.5e6)
    cf = CaptureFile(str(p))
    assert cf.sample_rate == 192000
    assert cf.freq == 98.5e6
    assert cf.length == 1000
    assert cf.time_start is not None
    assert cf.time_start.year == 2024 and cf.time_start.second == 45
    got = cf.read_at(0, 1000)
    assert np.max(np.abs(got - iq)) < 1e-3
    cf.close()


def test_raw_c64_and_seek(tmp_path):
    x = np.arange(5000, dtype=np.complex64)
    p = tmp_path / "cap.c64"
    x.tofile(str(p))
    src = FileSource(str(p), fmt="c64", sample_rate=1e6)
    src.seek(1200)
    out, flags = src.read_samples(100)
    np.testing.assert_array_equal(out, x[1200:1300])
    src.seek_time(0.003)  # 3000 samples at 1 MHz
    out, _ = src.read_samples(10)
    np.testing.assert_array_equal(out, x[3000:3010])
    assert src.duration() == pytest.approx(0.005)
    src.close()


def test_timing_file_gap_padding(tmp_path):
    # file has 200 samples; timeline: 0-99 at tick 0, then a 50-tick gap,
    # then samples 100-199 at tick 150
    x = (np.arange(200) + 1).astype(np.complex64)
    p = tmp_path / "cap.c64"
    x.tofile(str(p))
    t = tmp_path / "cap.timing"
    t.write_text("# timing\nR1000\n0,0\n150,100\n")
    src = FileSource(str(p), fmt="c64", timing_paths=[str(t)], pad=True)
    assert src.sample_rate == 1000.0
    assert src.files[0].padded_length == 250
    out, flags = src.read_samples(250)
    np.testing.assert_array_equal(out[:100], x[:100])
    assert np.all(out[100:150] == 0)          # the gap, zero-padded
    np.testing.assert_array_equal(out[150:250], x[100:200])
    assert flags & stream_flags.EMPTY_PAYLOAD  # gap signalled
    # end of stream
    out2, flags2 = src.read_samples(10)
    assert flags2 & stream_flags.STREAM_END
    src.close()


def test_timing_gap_skip_mode(tmp_path):
    x = (np.arange(200) + 1).astype(np.complex64)
    p = tmp_path / "cap.c64"
    x.tofile(str(p))
    t = tmp_path / "cap.timing"
    t.write_text("R1000\n0,0\n150,100\n")
    src = FileSource(str(p), fmt="c64", timing_paths=[str(t)], pad=False)
    out, _ = src.read_samples(200)
    np.testing.assert_array_equal(out, x)  # gap skipped, contiguous data
    src.close()


def test_playlist_and_loop(tmp_path):
    a = np.full(100, 1.0, np.complex64)
    b = np.full(50, 2.0, np.complex64)
    pa, pb = tmp_path / "a.c64", tmp_path / "b.c64"
    a.tofile(str(pa))
    b.tofile(str(pb))
    src = FileSource([str(pa), str(pb)], fmt="c64", sample_rate=1000)
    out, flags = src.read_samples(130)
    assert np.all(out[:100] == 1.0) and np.all(out[100:130] == 2.0)
    assert src.file_index == 1
    out2, flags2 = src.read_samples(40)
    assert np.all(out2[:20] == 2.0) and np.all(out2[20:] == 0)
    assert flags2 & stream_flags.STREAM_END
    # loop mode wraps
    src2 = FileSource([str(pa), str(pb)], fmt="c64", sample_rate=1000,
                      loop=True)
    out3, flags3 = src2.read_samples(300)
    assert np.all(out3[:100] == 1.0)
    assert np.all(out3[100:150] == 2.0)
    assert np.all(out3[150:250] == 1.0)
    assert not (flags3 & stream_flags.STREAM_END)
    src.close()
    src2.close()
