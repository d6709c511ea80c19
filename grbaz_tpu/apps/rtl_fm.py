"""rtl_fm — WBFM broadcast receiver app (samples/RTL-FM.grc equivalent).

Input: a capture file (WAV/auxi, raw c64/i16/u8), a BorIP server, or
the synthetic device. Output: 16-bit WAV audio. The whole DSP chain is
one compiled XLA program (models.wbfm).

Usage:
  python -m grbaz_tpu.apps.rtl_fm --input cap.wav --freq -250e3 -o out.wav
  python -m grbaz_tpu.apps.rtl_fm --borip host:28888 --freq 100.1e6 ...
  python -m grbaz_tpu.apps.rtl_fm --synth --seconds 2 -o out.wav
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np


def write_wav(path, audio: np.ndarray, rate: int):
    pcm = np.clip(np.round(audio * 32767.0), -32768, 32767).astype(np.int16)
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def main(argv=None):
    ap = argparse.ArgumentParser(description="WBFM receiver (RTL-FM chain)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="capture file (wav/c64/i16/u8)")
    src.add_argument("--borip", help="BorIP server host[:port]")
    src.add_argument("--synth", action="store_true",
                     help="synthetic FM station (test mode)")
    ap.add_argument("--fmt", default="auto", help="raw file format")
    ap.add_argument("--rate", type=float, default=3.2e6,
                    help="input sample rate (raw files / synth)")
    ap.add_argument("--freq", type=float, default=0.0,
                    help="station offset within the band (Hz)")
    ap.add_argument("--audio-rate", type=float, default=48e3)
    ap.add_argument("--decim", type=int, default=8)
    ap.add_argument("--squelch", type=float, default=None,
                    help="power squelch threshold (dB)")
    ap.add_argument("--deviation", type=float, default=None,
                    help="FM max deviation (default: min(75k, quad/5))")
    ap.add_argument("--seconds", type=float, default=None,
                    help="stop after this many seconds of input")
    ap.add_argument("-o", "--output", required=True, help="output WAV")
    ap.add_argument("--block", type=int, default=1 << 17)
    args = ap.parse_args(argv)

    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm

    rate = args.rate
    # --- input feeder ---
    if args.input:
        from grbaz_tpu.io.file_source import FileSource
        fsrc = FileSource(args.input, fmt=args.fmt, sample_rate=args.rate)
        rate = fsrc.sample_rate or args.rate
        read = fsrc.read_samples
    elif args.borip:
        from grbaz_tpu.net.borip_client import RemoteDevice
        host, _, port = args.borip.partition(":")
        dev = RemoteDevice(host, int(port or 28888), udp_port=0)
        dev.set_sample_rate(args.rate)
        dev.set_freq(args.freq)
        dev.start()
        read = lambda n: (dev.wait_samples(n), 0)
    else:
        from grbaz_tpu.net.devices import SyntheticDevice
        # an FM station carrying a 1 kHz tone at the tuned offset
        import numpy as _np

        deviation = args.deviation or min(75e3, args.rate / args.decim / 5)

        class _FMStation(SyntheticDevice):
            def read_samples(self, n):
                t = (self._n + _np.arange(n)) / self._rate
                msg = _np.sin(2 * _np.pi * 1000.0 * t)
                # carry the FM phase integral across blocks
                ph = self._acc + 2 * _np.pi * _np.cumsum(deviation * msg) / self._rate
                self._acc = float(ph[-1])
                x = _np.exp(1j * (ph + 2 * _np.pi * args.freq * t))
                self._n += n
                return x.astype(_np.complex64)

        dev = _FMStation(rate=args.rate, realtime=False)
        dev._n = 0
        dev._acc = 0.0
        read = lambda n: (dev.read_samples(n), 0)

    cfg = WBFMConfig(sample_rate=rate, center_freq=args.freq,
                     decim=args.decim, audio_rate=args.audio_rate,
                     squelch_db=args.squelch, block_size=args.block,
                     max_deviation=args.deviation
                     or min(75e3, rate / args.decim / 5))
    fg, handles = build_wbfm(cfg)
    ex = StreamExecutor(fg, {"iq": InputSpec((cfg.block_size,), "complex64",
                                             rate)})
    total = int((args.seconds or 1.0) * rate) if (args.seconds or args.synth) \
        else None
    audio = []
    fed = 0
    from grbaz_tpu.core.stream import stream_flags
    while True:
        x, flags = read(cfg.block_size) if args.input else (read(cfg.block_size)[0], 0)
        if len(x) < cfg.block_size:
            pad = np.zeros(cfg.block_size, np.complex64)
            pad[:len(x)] = x
            r = ex.step({"iq": pad}, counts={"iq": len(x)})
        else:
            r = ex.step({"iq": x})
        d, c = r["audio"]
        audio.append(d[:c])
        fed += cfg.block_size
        if args.input and (flags & stream_flags.STREAM_END):
            break
        if total is not None and fed >= total:
            break
    out = np.concatenate(audio) if audio else np.zeros(0, np.float32)
    write_wav(args.output, out, int(args.audio_rate))
    print(f"wrote {len(out)} audio samples ({len(out)/args.audio_rate:.2f}s) "
          f"to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
