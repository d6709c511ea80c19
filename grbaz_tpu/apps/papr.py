"""papr — peak-to-average power ratio analysis of an IQ capture.

Equivalent of /root/reference/apps/papr.py (offline PAPR tool with a
moving-average envelope and matplotlib plots): loads an IQ file (or
synthesizes a test signal), computes instantaneous power, a moving
average, PAPR, and the CCDF (probability that instantaneous power
exceeds the average by x dB); exports CSV instead of plotting. The
power pipeline is one jitted program.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

_DTYPES = {"c8": None, "c64": np.complex64, "i16": np.int16, "u8": np.uint8}


def load_iq(path: str, fmt: str, trim: int | None = None) -> np.ndarray:
    if fmt == "c8":  # interleaved signed byte IQ (the reference default)
        raw = np.fromfile(path, np.int8)
        x = (raw[0::2].astype(np.float32)
             + 1j * raw[1::2].astype(np.float32)) / 128.0
    elif fmt == "c64":
        x = np.fromfile(path, np.complex64)
    elif fmt == "i16":
        raw = np.fromfile(path, np.int16).astype(np.float32) / 32767.0
        x = raw[0::2] + 1j * raw[1::2]
    elif fmt == "u8":
        raw = (np.fromfile(path, np.uint8).astype(np.float32) - 127.5) / 127.5
        x = raw[0::2] + 1j * raw[1::2]
    else:
        raise ValueError(f"type {fmt!r} not in {sorted(_DTYPES)}")
    x = x.astype(np.complex64)
    return x[:trim] if trim else x


def main(argv=None):
    ap = argparse.ArgumentParser(description="PAPR / CCDF analysis")
    ap.add_argument("input", nargs="?", help="IQ file (default: synth QPSK)")
    ap.add_argument("-t", "--type", default="c8",
                    choices=sorted(_DTYPES), help="input sample format")
    ap.add_argument("-T", "--trim", type=int, help="max samples")
    ap.add_argument("-w", "--window", type=int, default=256,
                    help="moving-average window")
    ap.add_argument("--csv", help="write CCDF table to CSV")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.input:
        x = load_iq(args.input, args.type, args.trim)
    else:
        rng = np.random.default_rng(0)
        sym = rng.choice([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], 1 << 16)
        x = np.repeat(sym, 4) * (1 / np.sqrt(2))
        # pulse-shape so the envelope varies (realistic PAPR > 0 dB)
        from grbaz_tpu.ops.fir import low_pass_taps
        h = low_pass_taps(1.0, 4.0, 0.35, 0.15)
        x = np.convolve(x, h, mode="same").astype(np.complex64)

    @jax.jit
    def analyze(xr, xi):
        p = xr * xr + xi * xi
        avg = jnp.mean(p)
        peak = jnp.max(p)
        w = args.window
        ma = jnp.convolve(p, jnp.ones(w, jnp.float32) / w, mode="same")
        # CCDF over 0..12 dB above average in 0.25 dB steps
        steps = jnp.arange(0.0, 12.25, 0.25)
        thr = avg * 10.0 ** (steps / 10.0)
        ccdf = jnp.mean(p[None, :] > thr[:, None], axis=1)
        return avg, peak, jnp.max(ma), steps, ccdf

    avg, peak, peak_ma, steps, ccdf = map(
        np.asarray, analyze(jnp.asarray(x.real), jnp.asarray(x.imag)))
    papr_db = 10.0 * np.log10(float(peak) / max(float(avg), 1e-30))
    papr_ma_db = 10.0 * np.log10(float(peak_ma) / max(float(avg), 1e-30))
    print(json.dumps(dict(samples=len(x),
                          avg_power=float(avg), peak_power=float(peak),
                          papr_db=round(papr_db, 3),
                          papr_ma_db=round(papr_ma_db, 3))))
    if args.csv:
        from grbaz_tpu.viz.export import write_csv
        write_csv(args.csv, zip(np.asarray(steps), np.asarray(ccdf)),
                  header=["db_above_avg", "prob"])
        print("wrote", args.csv, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
