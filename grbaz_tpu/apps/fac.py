"""fac — fast auto-correlation spectrum analyzer.

Equivalent of /root/reference/apps/usrp_fac.py (a 32k-point FAC display
over a USRP) and the facsink window it instantiates: source -> FAC
pipeline (FFT -> |.| -> FFT -> |.| -> averaging -> log) -> CSV / PNG
export. Sources: capture file, BorIP/raw UDP, or a synthetic two-tone
signal whose correlation structure shows up as FAC peaks.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="fast auto-correlation analyzer")
    ap.add_argument("--input", help="capture file (default: synthetic)")
    ap.add_argument("--udp-port", type=int, help="BorIP UDP source port")
    ap.add_argument("--rate", type=float, default=250e3)
    ap.add_argument("--fac-size", type=int, default=512)
    ap.add_argument("--fac-rate", type=float, default=3.0)
    ap.add_argument("--avg", type=float, default=0.25)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--csv", help="write FAC rows to CSV")
    ap.add_argument("--png", help="write FAC waterfall PNG")
    args = ap.parse_args(argv)

    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.models.spectral import FACConfig, build_fac

    cfg = FACConfig(fac_size=args.fac_size, sample_rate=args.rate,
                    fac_rate=args.fac_rate, avg_alpha=args.avg,
                    block_size=args.block)
    fg, _ = build_fac(cfg)
    ex = StreamExecutor(fg, {"iq": InputSpec((args.block,), "complex64",
                                             args.rate)})

    if args.udp_port is not None:
        import time
        from grbaz_tpu.net.udp import UDPSampleReceiver
        rx = UDPSampleReceiver(port=args.udp_port, bor=True)

        def read(n):
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
            # 5 kHz pulse train: the FAC (an autocorrelation) peaks at
            # the period lag = rate/5e3 samples (bin 50 at 250 kS/s)
            k = ph[0] + np.arange(n)
            ph[0] += n
            period = int(args.rate / 5e3)
            x = np.where(k % period < 4, 1.0, 0.0)
            return (x + 0.01 * rng.standard_normal(n)).astype(np.complex64)

    rows = []
    while len(rows) < args.frames:
        r = ex.step({"iq": read(args.block)})
        d, c = r["fac"]
        rows.extend(d[:c])
    fac = np.asarray(rows[: args.frames])
    peak_bin = int(np.argmax(fac[-1][1:])) + 1  # skip the zero-lag bin
    print(f"collected {len(fac)} FAC frames of {args.fac_size} bins; "
          f"strongest correlation at bin {peak_bin}")
    if args.csv:
        np.savetxt(args.csv, fac, fmt="%.2f", delimiter=",")
        print("wrote", args.csv, file=sys.stderr)
    if args.png:
        from grbaz_tpu.viz import WaterfallSink
        wf = WaterfallSink(width=fac.shape[1], rows=len(fac),
                           vmin=float(fac.min()), vmax=float(fac.max()))
        for row in fac:
            wf.push(row)
        wf.save_png(args.png)
        print("wrote", args.png, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
