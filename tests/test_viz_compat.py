"""Export sinks, debug sink, any-block escape hatch, compat bridges."""

import io
import os
import threading

import numpy as np
import pytest

from grbaz_tpu.viz import (DoACompass, EyeSink, PlotSink, StaticText,
                           TimePanel, WaterfallSink, write_image)


def test_waterfall_sink_png(tmp_path):
    wf = WaterfallSink(width=64, rows=16, vmin=-80, vmax=0,
                       center_freq=100e6, span=1e6)
    for i in range(20):
        wf.push(np.linspace(-80, 0, 64) * (i % 2))
    rgb = wf.to_rgb()
    assert rgb.shape == (16, 64, 3) and rgb.dtype == np.uint8
    # the newest rows differ between the alternating spectra
    assert not np.array_equal(rgb[-1], rgb[-2])
    p = tmp_path / "wf.png"
    wf.save_png(str(p))
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    ax = wf.freq_axis()
    assert ax[0] == pytest.approx(99.5e6) and ax[-1] == pytest.approx(100.5e6)


def test_plot_and_eye_sinks(tmp_path):
    ps = PlotSink(keep=3, x_label="bin", y_label="dB")
    for i in range(5):
        ps.push(np.full(8, i, np.float32))
    assert len(ps.history()) == 3
    assert ps.latest()[0] == 4
    ps.save_csv(str(tmp_path / "p.csv"))
    assert (tmp_path / "p.csv").read_text().startswith("bin,dB")

    # eye: clean random NRZ at 8 samples/symbol has a full 2.0 opening
    sps = 8
    rng = np.random.default_rng(3)
    sym = np.repeat(rng.choice([1.0, -1.0], 32), sps).astype(np.float32)
    eye = EyeSink(samples_per_symbol=sps, traces=16)
    eye.push(sym)
    t = eye.traces()
    assert t.shape[1] == 2 * sps
    assert abs(eye.eye_opening()) == pytest.approx(2.0)


def test_compass_text_timepanel():
    c = DoACompass()
    c.update([0.0, 90.0], [1.0, 0.5])
    rose = c.ascii_rose(width=33)
    lines = rose.splitlines()
    assert lines[0][0] == "N" and lines[1][0] == "^"
    assert lines[1][8] == "^"  # 90 deg at quarter width

    changes = []
    st = StaticText("freq", formatter=lambda v: f"{v/1e6:.3f} MHz",
                    on_change=changes.append)
    st.set_value(100e6)
    st.set_value(100e6)
    assert st.text == "freq: 100.000 MHz" and len(changes) == 1

    tp = TimePanel(sample_rate=1e6)
    tp.set_epoch(1000, 0.5)
    tp.advance(2_000_000)
    assert tp.stream_time() == pytest.approx(1002.5)


def test_print_char_bursts():
    from grbaz_tpu.utils.debug import PrintChar
    out = io.StringIO()
    pc = PrintChar(threshold=0.5, out=out)
    data = np.array([0xAB, 0xCD, 0x12, 0x34], np.uint8)
    level = np.array([1.0, 1.0, 0.0, 1.0], np.float32)
    pc.process(data, level)
    txt = out.getvalue()
    assert "ABCD" in txt and "[2 symbols]" in txt and "12" not in txt
    assert "34" in txt


def test_print_char_file_tee(tmp_path):
    from grbaz_tpu.utils.debug import PrintChar
    f = tmp_path / "tee.txt"
    pc = PrintChar(threshold=0.0, file=str(f), out=io.StringIO())
    pc.process(np.array([1, 2, 255], np.uint8))
    pc.close()
    assert f.read_text() == "0102FF"


def test_any_block_stateful():
    import jax.numpy as jnp
    from grbaz_tpu.core.block import AnyBlock
    from grbaz_tpu.core.stream import Stream, StreamMeta

    def accum(state, params, x):
        new = state + jnp.sum(x.data)
        return new, x.like(x.data * params["k"])

    blk = AnyBlock(accum, init_state=lambda: jnp.float32(0),
                   init_params=lambda: dict(k=jnp.float32(2.0)))
    xs = Stream(data=jnp.arange(4, dtype=jnp.float32), count=jnp.int32(4),
                meta=StreamMeta.start(1e3))
    s, (y,) = blk.apply(blk.init_state(), blk.init_params(), xs)
    assert float(s) == 6.0
    assert np.allclose(np.asarray(y.data), [0, 2, 4, 6])


def test_any_code_expression_and_block():
    import jax.numpy as jnp
    from grbaz_tpu.core.block import any_code
    from grbaz_tpu.core.stream import Stream, StreamMeta

    xs = Stream(data=jnp.array([3.0, -4.0]), count=jnp.int32(2),
                meta=StreamMeta.start(1e3))
    expr = any_code("jnp.abs(x) ** 2")
    _, (y,) = expr(xs)
    assert np.allclose(np.asarray(y.data), [9, 16])

    src = """
def init_state():
    return jnp.float32(0)

def apply(state, params, x):
    return state + 1, x.like(x.data + state)
"""
    blk = any_code(src)
    st = blk.init_state()
    st, (y1,) = blk.apply(st, None, xs)
    st, (y2,) = blk.apply(st, None, xs)
    assert np.allclose(np.asarray(y1.data), [3, -4])
    assert np.allclose(np.asarray(y2.data), [4, -3])


def test_baudline_fifo_bridge(tmp_path):
    from grbaz_tpu.compat.baudline import BaudlineSink
    bl = BaudlineSink(sample_rate=48000, is_complex=True, fmt="le16",
                      mode="fifo", spawn=False)
    try:
        assert os.path.exists(bl.fifo_path)
        assert "-samplerate 48000" in bl.command
        assert "-quadrature" in bl.command
        got = {}

        def reader():
            with open(bl.fifo_path, "rb") as f:
                got["data"] = f.read(16)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        x = np.array([1.0 + 0j, 0 - 1.0j, 0.5 + 0.25j, 0], np.complex64)
        bl.write(x)
        bl.close()
        t.join(timeout=5)
        wire = np.frombuffer(got["data"], "<i2")
        assert wire[0] == 32767 and wire[3] == -32767
        assert wire[4] == pytest.approx(16384, abs=1)
    finally:
        bl.close()


def test_doppler_tracker():
    from grbaz_tpu.compat.horizons import C_M_S, DopplerTracker

    class Dev:
        def __init__(self):
            self.tuned = []

        def freq(self, f=None):
            if f is None:
                return self.tuned[-1]
            self.tuned.append(f)
            return True

    dev = Dev()
    # receding at 7 km/s -> downshift
    trk = DopplerTracker(lambda t: 7000.0, dev, base_freq=437e6,
                         now=lambda: 0.0)
    tuned = trk.step()
    expect = 437e6 * (1 - 7000.0 / C_M_S)
    assert tuned == pytest.approx(expect)
    assert trk.get()["range_rate"] == 7000.0
    trk.set_freq(145.8e6)
    assert dev.tuned[-1] == pytest.approx(145.8e6 * (1 - 7000.0 / C_M_S))


def test_usrp_legacy_shim():
    from grbaz_tpu.compat.usrp import ADC_FREQ, source_c
    from grbaz_tpu.net.devices import SyntheticDevice

    u = source_c(decim_rate=256, device=SyntheticDevice())
    assert u.adc_freq() == ADC_FREQ
    # decim model: rate = adc/decim
    assert u._dev.sample_rate() == pytest.approx(ADC_FREQ / 256)
    u.set_decim_rate(64)
    assert u._dev.sample_rate() == pytest.approx(ADC_FREQ / 64)
    sub = u.selected_subdev((0, 0))
    lo, hi, step = sub.gain_range()
    assert sub.set_gain(0.5 * (lo + hi))
    tr = u.tune(0, sub, 10.7e6)
    assert tr is not None and tr.baseband_freq == pytest.approx(10.7e6, rel=1e-3)
    u.start()
    x = u.read_samples(1024)
    assert len(x) == 1024 and x.dtype == np.complex64
    u.stop()
    u.close()
