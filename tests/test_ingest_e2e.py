"""Full ingest path: BorIP UDP wire -> native receiver -> StreamPump ->
compiled WBFM chain -> audio. The 'remote SDR to speakers' stack of the
reference (borip server + udp_source + RTL-FM chain) on localhost."""

import time

import numpy as np

from grbaz_tpu.core.executor import InputSpec, StreamExecutor
from grbaz_tpu.core.pump import StreamPump
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from grbaz_tpu.net.udp import (UDPSampleReceiver, UDPSampleSender,
                               complex_to_ishort_bytes)
from tests.conftest import snr_db


def test_borip_udp_to_wbfm_audio():
    fs = 256e3
    block = 1 << 14
    n_blocks = 6
    cfg = WBFMConfig(sample_rate=fs, center_freq=0.0, decim=4,
                     audio_rate=32e3, max_deviation=25e3,
                     channel_width=50e3, transition=25e3,
                     block_size=block)
    fg, _ = build_wbfm(cfg)
    ex = StreamExecutor(fg, {"iq": InputSpec((block,), "complex64", fs)})

    # synthesize FM: 1 kHz tone, 25 kHz deviation
    n = block * n_blocks
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 1000.0 * t)
    iq = np.exp(1j * (2 * np.pi * 25e3 * np.cumsum(msg) / fs)) \
        .astype(np.complex64)
    iq *= 0.5  # headroom for ishort wire format

    rx = UDPSampleReceiver(port=0, bor=True)
    tx = UDPSampleSender("127.0.0.1", rx.port, bor=True)

    def source():
        data, _flags = rx.read_complex(block)
        if len(data) < block:
            return None  # wait for a full block
        return {"iq": data[:block].astype(np.complex64)}

    audio = []

    def sink(data, count):
        audio.append(np.asarray(data)[:count])

    pump = StreamPump(ex, source, {"audio": sink})
    pump.start()

    # stream the samples over the BorIP UDP plane in wire format
    for b in range(n_blocks):
        chunk = iq[b * block:(b + 1) * block]
        tx.send_complex(chunk)
        time.sleep(0.02)

    deadline = time.monotonic() + 60
    want_blocks = n_blocks - 1  # receiver may straddle packet boundaries
    while len(audio) < want_blocks and time.monotonic() < deadline:
        time.sleep(0.05)
    pump.stop()
    rx.close()
    tx.close()

    assert len(audio) >= want_blocks, \
        f"only {len(audio)} audio blocks arrived"
    a = np.concatenate(audio)
    a = a[2048:]  # skip filter/resampler warmup
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1.0 / cfg.audio_rate)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 1000.0) < 10, f"tone at {peak} Hz, expected 1 kHz"
    # the wire is 16-bit ishort: expect clean recovery, not bit-exact
    k = np.argmax(spec)
    sig = np.sum(spec[max(0, k - 4):k + 5] ** 2)
    sinad = 10 * np.log10(sig / max(np.sum(spec ** 2) - sig, 1e-30))
    assert sinad > 20, f"SINAD {sinad:.1f} dB too low"
