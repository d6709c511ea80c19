"""The reference's 5-part tutorial flowgraphs, framework-native.

The reference ships samples/tutorial/part-01..05 as GRC flowgraphs that
double as its manual integration tests (SURVEY.md §4 — "directory names
are the test spec"). Each part here is a self-checking function: it
builds the equivalent flowgraph, runs it on synthetic input, asserts
the expected result, and returns a result dict.

Run all parts:  python examples/tutorial.py
Run one part:   python examples/tutorial.py 3
"""

from __future__ import annotations

import sys

import numpy as np


def part1_sources_and_sinks():
    """Part 01: sine wave, delay test, any-block, noise, GLFSR histogram."""
    import jax
    import jax.numpy as jnp
    from grbaz_tpu.core.block import any_code
    from grbaz_tpu.core.graph import Flowgraph
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.ops.basic import VariableDelay
    from grbaz_tpu.ops.fec import GLFSRSource
    from grbaz_tpu.viz.sinks import HistoSink

    n = 4096
    fs = 32e3
    t = np.arange(n) / fs
    sine = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    # -- "Delay test (Sine wave source)": a sine minus its 1-period
    # delayed copy cancels
    period = int(round(fs / 440.0 * 2))  # even, near 1 period... use exact
    # use an exact integer-period tone instead so cancellation is exact
    cyc = 64
    tone = np.sin(2 * np.pi * np.arange(n) * (1.0 / cyc)).astype(np.float32)
    fg = Flowgraph("delay_test")
    dl = VariableDelay(max_delay=256, delay=cyc, dtype=jnp.float32,
                       name="delay")
    fg.input("x", dl)
    fg.output("delayed", dl)
    step = jax.jit(fg.build_step())
    states, params = fg.init_states(), fg.init_params()
    states, outs = step(states, params, {"x": Stream.full(jnp.asarray(tone))})
    delayed = np.asarray(outs["delayed"].data)
    resid = tone[cyc:] - delayed[cyc:]
    assert np.max(np.abs(resid)) < 1e-6, "delayed tone must align"

    # -- "baz_any test": inline-code block squares the stream
    sq = any_code("x * x", name="sq")
    st, (y,) = sq.apply(sq.init_state(), sq.init_params(),
                        Stream.full(jnp.asarray(sine)))
    assert np.allclose(np.asarray(y.data), sine * sine, atol=1e-6)

    # -- "Histo sink test (GLFSR source)": bipolar PN bits are ~50/50
    src = GLFSRSource(degree=16, block_size=8192, bipolar=True)
    state = src.init_state()
    histo = HistoSink(n_bins=8, lo=-1.5, hi=1.5)
    for _ in range(4):
        state, (bits,) = jax.jit(src.apply)(state, src.init_params())
        histo.push(np.asarray(bits.data))
    counts = histo.counts
    lo_bin = counts[: len(counts) // 2].sum()
    hi_bin = counts[len(counts) // 2:].sum()
    balance = lo_bin / max(hi_bin, 1)
    assert 0.9 < balance < 1.1, f"PN bits unbalanced: {balance}"
    return dict(delay_residual=float(np.max(np.abs(resid))),
                pn_balance=float(balance), histogram=histo.render(20))


def part2_hysteresis_and_ber():
    """Part 02: hysteresis, BER test with biased random bit flips."""
    import jax
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.ops.basic import Hysteresis
    from grbaz_tpu.ops.fec import GLFSRSource, PNBERv

    # -- hysteresis: noisy slow sine through a two-threshold comparator
    # gives a clean square wave (no chatter at the crossings)
    n = 8192
    rng = np.random.default_rng(5)
    x = (np.sin(2 * np.pi * np.arange(n) / 1024)
         + 0.08 * rng.standard_normal(n)).astype(np.float32)
    hb = Hysteresis(low=-0.3, high=0.3)
    state, params = hb.init_state(), hb.init_params()
    state, (y,) = jax.jit(hb.apply)(state, params,
                                    Stream.full(jnp.asarray(x)))
    sq = np.asarray(y.data)
    transitions = int(np.sum(np.abs(np.diff(sq)) > 0.5))
    expected = 2 * (n // 1024)  # two crossings per cycle
    assert abs(transitions - expected) <= 2, \
        f"hysteresis chattered: {transitions} transitions"

    # -- BER test: GLFSR PN -> biased random flips -> self-syncing tester
    deg, mask = 7, 0x60
    block = 10000
    src = GLFSRSource(degree=deg, block_size=block, mask=mask,
                      convention="pn")
    tester = PNBERv(degree=deg, mask=mask, alpha=3e-4)
    sstate = src.init_state()
    tstate, tparams = tester.init_state(), tester.init_params()
    flip_p = 0.01
    ber = 0.0
    for i in range(5):
        sstate, (bits,) = jax.jit(src.apply)(sstate, src.init_params())
        b = np.asarray(bits.data)
        flips = (rng.random(block) < flip_p).astype(np.uint8)
        rx = (b ^ flips).astype(np.uint8)
        tstate, outs = jax.jit(tester.apply)(
            tstate, tparams, Stream.full(jnp.asarray(rx)))
        ber = float(np.asarray(outs[0].data)[-1])
    # self-synced tester sees each flip ~(weight+1)=3 times
    assert flip_p < ber < 6 * flip_p, f"BER estimate off: {ber}"
    return dict(transitions=transitions, ber=ber)


def part3_udp_fac():
    """Part 03: UDP source + FAC — a pulse train sent over localhost UDP
    shows its repetition period in the autocorrelation."""
    import time
    import jax
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.models.spectral import FACConfig, build_fac
    from grbaz_tpu.net.udp import UDPSampleReceiver, UDPSampleSender

    fs = 250e3
    period = 50
    n = 1 << 16
    k = np.arange(n)
    x = np.where(k % period < 4, 1.0, 0.0).astype(np.complex64)

    rx = UDPSampleReceiver(port=0, bor=True)
    tx = UDPSampleSender("127.0.0.1", rx.port, bor=True)
    got = []

    def drain():
        d, _ = rx.read_complex(n)
        if len(d):
            got.append(d)

    # interleave send and drain so the localhost socket buffer never
    # overflows (one-shot UDP blasts drop packets on loaded hosts)
    chunk = 1 << 12
    for i in range(0, n, chunk):
        tx.send_complex(x[i:i + chunk])
        drain()
        time.sleep(0.002)
    deadline = time.time() + 5
    while sum(len(g) for g in got) < n and time.time() < deadline:
        drain()
        time.sleep(0.01)
    tx.close()
    rx.close()
    xr = np.concatenate(got)[:n] if got else np.zeros(0, np.complex64)
    assert len(xr) == n, \
        f"UDP transfer incomplete ({sum(len(g) for g in got)}/{n})"

    cfg = FACConfig(fac_size=512, sample_rate=fs, fac_rate=1e9)
    fg, _ = build_fac(cfg)
    step = jax.jit(fg.build_step())
    states, params = fg.init_states(), fg.init_params()
    states, outs = step(states, params,
                        {"iq": Stream.full(jnp.asarray(xr), sample_rate=fs)})
    fac = np.asarray(outs["fac"].data)
    rows = int(outs["fac"].count)
    last = fac[rows - 1]
    peak = int(np.argmax(last[8:256])) + 8  # skip the zero-lag skirt
    assert peak % period == 0, f"FAC peak at {peak}, expected k*{period}"
    return dict(fac_peak_bin=peak)


def part4_fac_noise():
    """Part 04: FAC on pure noise — no false periodicity."""
    import jax
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.models.spectral import FACConfig, build_fac

    rng = np.random.default_rng(11)
    n = 1 << 16
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    cfg = FACConfig(fac_size=512, sample_rate=250e3, fac_rate=1e9,
                    avg_alpha=0.5)
    fg, _ = build_fac(cfg)
    step = jax.jit(fg.build_step())
    states, params = fg.init_states(), fg.init_params()
    states, outs = step(states, params,
                        {"iq": Stream.full(jnp.asarray(x), sample_rate=250e3)})
    fac = np.asarray(outs["fac"].data)
    last = fac[int(outs["fac"].count) - 1]
    body = last[8:256]
    spread_db = float(np.max(body) - np.median(body))
    assert spread_db < 12.0, f"false FAC peak on noise: {spread_db:.1f} dB"
    return dict(noise_fac_spread_db=spread_db)


def part5_fft_bin_phase():
    """Part 05: FFT bin phase test — a tone at an exact bin center keeps
    a constant per-frame phase; offset by half the frame rate it rotates
    pi per frame."""
    import numpy as np

    fft_size = 1024
    n_frames = 8
    k_bin = 100

    def frame_phases(freq_bins: float):
        t = np.arange(fft_size * n_frames)
        x = np.exp(2j * np.pi * freq_bins / fft_size * t)
        frames = x.reshape(n_frames, fft_size)
        spec = np.fft.fft(frames, axis=1)
        return np.angle(spec[:, k_bin])

    ph_centered = frame_phases(float(k_bin))
    dph_c = np.angle(np.exp(1j * np.diff(ph_centered)))
    assert np.max(np.abs(dph_c)) < 1e-6, "bin-centered tone must not rotate"

    ph_off = frame_phases(k_bin + 0.5)
    dph_o = np.angle(np.exp(1j * np.diff(ph_off)))
    assert np.allclose(np.abs(dph_o), np.pi, atol=1e-3), \
        "half-bin offset must rotate pi per frame"
    return dict(centered_rotation=float(np.max(np.abs(dph_c))),
                offset_rotation=float(np.mean(np.abs(dph_o))))


PARTS = {1: part1_sources_and_sinks, 2: part2_hysteresis_and_ber,
         3: part3_udp_fac, 4: part4_fac_noise, 5: part5_fft_bin_phase}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    backend = "cpu"
    if argv and argv[0].startswith("--backend="):
        backend = argv[0].split("=", 1)[1]
        argv = argv[1:]
    # tutorials default to CPU: the container's TPU attachment is
    # restricted (see .claude/skills/verify/SKILL.md) and these parts
    # are functional demos, not benchmarks
    import jax
    try:
        jax.config.update("jax_platforms", backend)
    except Exception:
        pass
    wanted = [int(a) for a in argv] if argv else sorted(PARTS)
    for p in wanted:
        res = PARTS[p]()
        brief = {k: v for k, v in res.items() if not isinstance(v, str)}
        print(f"part-{p:02d} OK: {brief}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
