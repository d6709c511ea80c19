"""Pin the block-vectorized kernels to recorded golden vectors.

tests/fixtures/golden.npz holds float64 outputs of serial NumPy mirrors
of the reference's per-sample loops (tools/make_golden_fixtures.py).
These tests run the production JAX blocks over the SAME recorded inputs
and require the recorded outputs — a drift guard: any change to tap
design, exact-phase arithmetic, resampler positions, or demod math that
moves outputs past f32 tolerance fails here even if the in-repo NumPy
mirrors were changed in the same commit (VERDICT r2 item 9).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grbaz_tpu.core.stream import Stream, StreamMeta
from tests.conftest import snr_db

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden.npz")


@pytest.fixture(scope="module")
def fix():
    return np.load(FIX)


def test_fixture_is_the_recorded_one(fix):
    """Checksums: catches silent regeneration of the recorded vectors."""
    assert fix["rs_out"].shape == (491,)
    assert fix["fir_out"].shape == (1024,)
    assert fix["wbfm_audio"].shape == (983,)
    # frozen statistical fingerprints (float64, exact at generation)
    assert abs(float(np.abs(fix["rs_out"]).sum()) - 492.8997104407716) < 1e-6
    assert abs(float(np.abs(fix["fir_out"]).sum()) - 322.67193974876517) < 1e-6
    assert abs(float(np.abs(fix["wbfm_audio"]).sum())
               - 566.1664312399506) < 1e-6


def test_resampler_matches_golden(fix):
    from grbaz_tpu.ops.resampler import FractionalResampler, HIST
    x = jnp.asarray(fix["rs_in"])
    n = int(x.shape[0])
    rs = FractionalResampler(n, float(fix["rs_ratio"]))
    st = jax.tree_util.tree_map(jnp.asarray, rs.init_state())
    st, (y,) = rs.apply(st, rs.init_params(), Stream.full(x))
    got = np.asarray(y.data)[: int(y.count)]
    want = fix["rs_out"]
    m = min(len(got), len(want))
    assert m >= len(want) - 2  # block form may hold back boundary outputs
    assert snr_db(want[:m], got[:m]) > 90.0


def test_fir_decimator_matches_golden(fix):
    from grbaz_tpu.ops.fir import FIRDecimator
    d = int(fix["fir_decim"])
    blk = FIRDecimator(fix["fir_taps"], d)
    st = jax.tree_util.tree_map(jnp.asarray, blk.init_state())
    st, (y,) = blk.apply(st, None, Stream.full(jnp.asarray(fix["fir_in"])))
    got = np.asarray(y.data)
    assert snr_db(fix["fir_out"], got) > 110.0


def test_wbfm_chain_matches_golden(fix):
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
    iq = fix["wbfm_in"]
    n = len(iq)
    cfg = WBFMConfig(block_size=n, center_freq=250e3)
    fg, _ = build_wbfm(cfg)
    step = jax.jit(fg.build_step())
    states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
    states, o = step(states, fg.init_params(),
                     {"iq": Stream.full(jnp.asarray(iq),
                                        sample_rate=cfg.sample_rate)})
    audio = np.asarray(o["audio"].data)[: int(o["audio"].count)]
    quad = np.asarray(o["quad"].data)[: int(o["quad"].count)]
    # the serial mirror's demod sees the un-truncated chain; skip the
    # filter warmup where the mirrors' history conventions differ
    w = 64
    assert snr_db(fix["wbfm_quad"][w:len(quad)], quad[w:]) > 55.0
    aw = 16
    m = min(len(audio), len(fix["wbfm_audio"]))
    assert m > 900
    assert snr_db(fix["wbfm_audio"][aw:m], audio[aw:m]) > 50.0


def test_agc_matches_golden(fix):
    from grbaz_tpu.ops.agc import AGC
    blk = AGC(rate=float(fix["agc_rate"]), reference=float(fix["agc_ref"]))
    st = jax.tree_util.tree_map(jnp.asarray, blk.init_state())
    st, (y, _env, _gain) = blk.apply(st, blk.init_params(),
                                     Stream.full(jnp.asarray(fix["agc_in"])))
    got = np.asarray(y.data)
    assert snr_db(fix["agc_out"], got) > 80.0
