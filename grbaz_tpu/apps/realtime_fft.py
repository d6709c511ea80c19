"""realtime_fft — network spectrum analyzer (apps/realtime_fft.py analog).

Receives samples over BorIP UDP (or reads a file / synthesizes), runs
the compiled PowerSpectrum chain, and exports spectra: CSV rows, a PNG
waterfall (colouriser raster), or re-broadcast over the message server.
The wx display of the reference is replaced by data export
(SURVEY.md §7 "What NOT to rebuild").
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="network spectrum analyzer")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--udp-port", type=int, help="BorIP UDP listen port")
    src.add_argument("--input", help="capture file")
    src.add_argument("--synth", action="store_true")
    ap.add_argument("--rate", type=float, default=250e3)
    ap.add_argument("--fft", type=int, default=4096)
    ap.add_argument("--avg", type=float, default=0.25)
    ap.add_argument("--frames", type=int, default=32,
                    help="spectra to collect before exit (0=forever)")
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--csv", help="write spectra rows to CSV")
    ap.add_argument("--waterfall", help="write waterfall PNG (PPM fallback)")
    args = ap.parse_args(argv)

    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.models.spectral import SpectralConfig, build_spectrum

    cfg = SpectralConfig(fft_size=args.fft, avg_alpha=args.avg,
                         block_size=args.block,
                         waterfall=bool(args.waterfall))
    fg, _ = build_spectrum(cfg)
    ex = StreamExecutor(fg, {"iq": InputSpec((args.block,), "complex64",
                                             args.rate)})

    if args.udp_port is not None:
        from grbaz_tpu.net.udp import UDPSampleReceiver
        rx = UDPSampleReceiver(port=args.udp_port, bor=True)

        def read(n):
            import time
            out = np.zeros(n, np.complex64)
            got = 0
            while got < n:
                x, _ = rx.read_complex(n - got)
                if len(x):
                    out[got:got + len(x)] = x
                    got += len(x)
                else:
                    time.sleep(0.005)
            return out
    elif args.input:
        from grbaz_tpu.io.file_source import FileSource
        fsrc = FileSource(args.input, sample_rate=args.rate)
        read = lambda n: fsrc.read_samples(n)[0]
    else:
        ph = [0]
        rng = np.random.default_rng(1234)

        def read(n):
            t = ph[0] + np.arange(n)
            ph[0] += n
            x = (0.5 * np.exp(2j * np.pi * 0.1 * t)
                 + 0.05 * np.exp(2j * np.pi * -0.23 * t)
                 + 0.01 * rng.standard_normal(n)).astype(np.complex64)
            return x

    spectra, rasters = [], []
    while args.frames == 0 or len(spectra) < args.frames:
        r = ex.step({"iq": read(args.block)})
        d, c = r["spectra"]
        spectra.extend(d[:c])
        if args.waterfall:
            rd, rc = r["raster"]
            rasters.extend(rd[:rc])
    spectra = np.asarray(spectra[:args.frames or None])
    print(f"collected {len(spectra)} spectra of {args.fft} bins; "
          f"peak {spectra.max():.1f} dBFS at bin {int(np.argmax(spectra.max(axis=0)))}")

    if args.csv:
        np.savetxt(args.csv, spectra, fmt="%.2f", delimiter=",")
        print("wrote", args.csv)
    if args.waterfall:
        rows = np.asarray(rasters).reshape(len(rasters), -1, 3)
        _write_image(args.waterfall, rows)
        print("wrote", args.waterfall)
    return 0


def _write_image(path: str, rgb):
    from grbaz_tpu.viz.export import write_image
    write_image(path, rgb)


if __name__ == "__main__":
    sys.exit(main())
