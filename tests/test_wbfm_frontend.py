"""Fused Pallas WBFM front end vs the reference XLA formulation.

The kernel (ops/pallas/wbfm_frontend.py) must match the rotate-then-
filter channelizer + quadrature demod chain the reference runs as
separate GR blocks (/root/reference/samples/RTL-FM.grc) — here checked
against this repo's XLA blocks, which are themselves golden-tested
against serial NumPy mirrors (tests/test_fir.py, tests/test_demod.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.models.wbfm import WBFMConfig, WBFMFrontend, build_wbfm
from grbaz_tpu.ops.fir import (low_pass_taps, prepare_taps,
                               xlating_fir_decimate_frame)
from grbaz_tpu.ops.pallas.wbfm_frontend import (
    demod_unrotated, packed_tap_matrix, rotate_output, rotated_taps,
    supported, xlating_fir_frame_pallas)

FS = 3.2e6
DECIM = 8


def _taps():
    return low_pass_taps(1.0, FS, 100e3, 75e3)


def _frame(rng, n_new, tpad):
    n = n_new + tpad - 1
    return jnp.asarray((rng.standard_normal(n)
                        + 1j * rng.standard_normal(n)).astype(np.complex64))


def test_kernel_matches_xla_rotated_taps(rng):
    """Interpret-mode kernel == XLA rotated-taps channelizer."""
    h = prepare_taps(_taps(), DECIM)
    n_new = 1024 * DECIM  # n_out=1024 -> 8 output rows
    assert supported(n_new, DECIM)
    frame = _frame(rng, n_new, h.shape[0])
    lo_inc = jnp.uint32(123456789)
    phase0 = jnp.uint32(987654321)
    ref = xlating_fir_decimate_frame(frame, jnp.asarray(h), DECIM,
                                     phase0, lo_inc)
    yf = xlating_fir_frame_pallas(frame, h, DECIM, lo_inc, interpret=True)
    got = rotate_output(yf, phase0, lo_inc, DECIM)
    scale = float(jnp.mean(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4 * max(scale, 1e-3)


def test_packed_tap_matrix_structure():
    """The block-diagonal packed tap matrix reproduces the polyphase
    partials: (Zr @ T)[r, g*cpm + m] = sum_i g[m*D+i] x[(r*rpr+g)*D+i]."""
    decim, n_phases_pad = 4, 8
    rpr, cpm = 128 // decim, n_phases_pad
    gp = jnp.asarray(np.arange(1, 33, dtype=np.float32))
    t_mat = np.asarray(packed_tap_matrix(gp, decim, n_phases_pad))
    assert t_mat.shape == (128, rpr * cpm)
    for gi in (0, 5, rpr - 1):
        for m in range(cpm):
            for i in range(decim):
                t = m * decim + i
                want = float(gp[t]) if t < 32 else 0.0
                assert t_mat[gi * decim + i, gi * cpm + m] == want
    # off-diagonal blocks are zero
    assert t_mat[0 * decim, 3 * cpm] == 0.0
    # one full check: packed row of rpr polyphase rows -> partials
    rng = np.random.default_rng(0)
    x = rng.standard_normal(128).astype(np.float32)
    q = x @ t_mat
    for gi in (0, 7):
        for m in range(cpm):
            t = np.arange(decim) + m * decim
            gvals = np.where(t < 32, np.arange(1, 33, dtype=np.float32)[
                np.clip(t, 0, 31)], 0.0)
            want = np.sum(gvals * x[gi * decim:(gi + 1) * decim])
            assert abs(q[gi * cpm + m] - want) < 1e-3


def test_demod_unrotated_matches_rotated_demod(rng):
    """wrap(atan2 + delta) == atan2 of the rotated product."""
    from grbaz_tpu.ops.demod import quadrature_demod
    from grbaz_tpu.ops import exact
    n = 4096
    yf = jnp.asarray((rng.standard_normal(n)
                      + 1j * rng.standard_normal(n)).astype(np.complex64))
    lo_inc = jnp.uint32(3123456789)
    phase0 = jnp.uint32(55555)
    gain = jnp.float32(0.85)
    y_rot = rotate_output(yf, phase0, lo_inc, DECIM)
    prev_rot = jnp.complex64(0.3 + 0.1j)
    d_ref, _ = quadrature_demod(y_rot, prev_rot, gain)
    bm1 = exact.turns_u32_to_radians(phase0 - jnp.uint32(DECIM) * lo_inc)
    prev_yf = (prev_rot * jnp.exp(-1j * bm1)).astype(jnp.complex64)
    d_got, last = demod_unrotated(yf, prev_yf, gain, lo_inc, DECIM)
    assert float(jnp.max(jnp.abs(d_got - d_ref))) < 1e-4
    assert complex(last) == complex(yf[-1])


@pytest.mark.parametrize("squelch", [None, -20.0])
def test_fused_chain_matches_unfused(rng, squelch):
    block = 1 << 15
    xs = [(rng.standard_normal(block)
           + 1j * rng.standard_normal(block)).astype(np.complex64)
          for _ in range(3)]
    outs = {}
    for fused in (False, True):
        cfg = WBFMConfig(block_size=block, center_freq=250e3,
                         squelch_db=squelch)
        cfg.fused = fused
        fg, _ = build_wbfm(cfg)
        step = jax.jit(fg.build_step())
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        params = fg.init_params()
        meta = StreamMeta.start(cfg.sample_rate)
        audio, quad = [], []
        for xb in xs:
            states, o = step(states, params,
                             {"iq": Stream(jnp.asarray(xb), jnp.int32(block),
                                           meta)})
            audio.append(np.asarray(o["audio"].data)[:int(o["audio"].count)])
            quad.append(np.asarray(o["quad"].data)[:int(o["quad"].count)])
        outs[fused] = (np.concatenate(audio), np.concatenate(quad))
    a0, q0 = outs[False]
    a1, q1 = outs[True]
    assert len(a0) == len(a1)
    # skip 1-sample cold-start difference (prev-sample convention)
    d = np.abs(q0[1:] - q1[1:])
    bad = np.where(d > 1e-4)[0]
    if squelch is None:
        assert len(bad) == 0
        p_sig = np.mean(a0[2:] ** 2)
        p_err = np.mean((a0[2:] - a1[2:]) ** 2)
        snr = 10 * np.log10(p_sig / max(p_err, 1e-30))
        assert snr > 90.0, f"fused audio SNR {snr:.1f} dB"
    else:
        # the squelch gate may flip on individual samples where the IIR
        # power average crosses the threshold within 1 ulp (the fused
        # path measures power on the unrotated signal); any disagreeing
        # sample must be a gate disagreement (one side zeroed), not a
        # value error
        assert len(bad) <= 8, f"{len(bad)} squelch mismatches"
        for i in bad:
            prod_zero = (q0[1 + i] == 0.0) or (q1[1 + i] == 0.0) \
                or (q0[2 + i] == 0.0) or (q1[2 + i] == 0.0) \
                or (q0[i] == 0.0) or (q1[i] == 0.0)
            assert prod_zero, f"non-gate mismatch at {i}"


def test_fused_streaming_invariant_to_block_split(rng):
    """Same samples fed as 2x8192 vs 1x16384 give identical outputs —
    the carried (tail, phase, prev) state is exact."""
    n = 1 << 14
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    taps = _taps()
    gain = 0.85

    def run(split):
        fe = WBFMFrontend(taps, DECIM, 250e3, FS, gain, backend="xla")
        st = jax.tree_util.tree_map(jnp.asarray, fe.init_state())
        pr = fe.init_params()
        meta = StreamMeta.start(FS)
        out = []
        for xb in np.split(x, split):
            st, (o,) = fe.apply(st, pr,
                                Stream(jnp.asarray(xb),
                                       jnp.int32(len(xb)), meta))
            out.append(np.asarray(o.data)[:int(o.count)])
        return np.concatenate(out)

    a = run(1)
    b = run(2)
    np.testing.assert_array_equal(a, b)


def test_retune_changes_station(rng):
    """lo_inc params retune mid-stream without recompilation."""
    fe = WBFMFrontend(_taps(), DECIM, 0.0, FS, 1.0, backend="xla")
    st = jax.tree_util.tree_map(jnp.asarray, fe.init_state())
    meta = StreamMeta.start(FS)
    n = 1 << 13
    t = np.arange(n)
    # station at +250 kHz, FM-modulated tone
    mod = np.cumsum(np.sin(2 * np.pi * 2e3 / FS * t)) * (50e3 / FS)
    x = np.exp(1j * 2 * np.pi * ((250e3 / FS) * t + mod)).astype(np.complex64)
    stream = Stream(jnp.asarray(x), jnp.int32(n), meta)
    ap = jax.jit(fe.apply)
    # tuned wrong: demod power low & wideband junk
    _, (o_wrong,) = ap(st, fe.init_params(), stream)
    # retune to the station via params only
    pr = dict(fe.init_params(), **WBFMFrontend.freq_params(250e3, FS))
    _, (o_right,) = ap(st, pr, stream)
    d_right = np.asarray(o_right.data)[64:int(o_right.count)]
    # recovered audio should be a clean 2 kHz tone: check dominant bin
    sp = np.abs(np.fft.rfft(d_right * np.hanning(len(d_right))))
    f_peak = np.argmax(sp) * (FS / DECIM) / len(d_right)
    assert abs(f_peak - 2e3) < 200.0


def test_rtf_kernel_matches_production_path(rng):
    """v4 rotate-then-filter kernel (interpret) == the production XLA
    channelizer (oscillator + rotate + fir_decimate_tail_block),
    including the carried-history phase convention."""
    from grbaz_tpu.ops import exact
    from grbaz_tpu.ops.fir import fir_decimate_tail_block
    from grbaz_tpu.ops.pallas.wbfm_frontend import \
        xlating_fir_frame_pallas_rtf

    h = prepare_taps(_taps(), DECIM)
    tpad = h.shape[0]
    n_new = 1024 * DECIM
    assert supported(n_new, DECIM)
    x = jnp.asarray((rng.standard_normal(n_new)
                     + 1j * rng.standard_normal(n_new))
                    .astype(np.complex64))
    tail = jnp.asarray((rng.standard_normal(tpad)
                        + 1j * rng.standard_normal(tpad))
                       .astype(np.complex64))
    phase0 = jnp.uint32(987654321)
    inc = jnp.uint32(123456789)

    lo, _ = exact.oscillator(n_new, phase0, inc)
    lo_t, _ = exact.oscillator(
        tpad, phase0 - jnp.uint32(tpad) * inc, inc)
    ref = fir_decimate_tail_block(tail * lo_t, x * lo, jnp.asarray(h),
                                  DECIM,
                                  precision=jax.lax.Precision.HIGHEST)
    got = xlating_fir_frame_pallas_rtf(
        jnp.concatenate([tail[1:], x]), h, DECIM, phase0, inc,
        precision="highest", interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-5 * scale


def test_xal_kernel_matches_production_path(rng):
    """v5 x-aligned kernel (interpret) == the production XLA
    channelizer including tail/head handling and uint32 phase chaining
    across multiple streaming blocks."""
    from grbaz_tpu.core.stream import Stream
    from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator

    n = 1024 * DECIM
    taps = _taps()
    blocks = 3
    x = (rng.standard_normal(n * blocks)
         + 1j * rng.standard_normal(n * blocks)).astype(np.complex64)

    def run(backend, interpret=False):
        blk = FreqXlatingFIRDecimator(taps, DECIM, 250e3, FS,
                                      backend=backend, interpret=interpret,
                                      precision="highest")
        st, pr = blk.init_state(), blk.init_params()
        st = jax.tree_util.tree_map(jnp.asarray, st)
        out = []
        for b in range(blocks):
            s = Stream.full(jnp.asarray(x[b * n:(b + 1) * n]))
            st, (y,) = blk.apply(st, pr, s)
            out.append(np.asarray(y.data))
        return np.concatenate(out)

    ref = run("xla")
    got = run("pallas_xal", interpret=True)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 1e-5 * scale
