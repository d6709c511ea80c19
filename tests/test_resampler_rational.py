"""Rational fast-path resampler == generic gather resampler, exactly.

The fast path (ops/resampler.resample_block_rational) replaces both
gathers with static polyphase reshapes + a small one-hot taps matmul;
the exactness guard falls back to the generic path under wide runtime
retunes. These tests pin value parity, streaming parity, ppb retunes,
partial blocks, and the guard itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.ops import exact
from grbaz_tpu.ops.mmse import NTAPS, TAPS_TABLE
from grbaz_tpu.ops.resampler import (HIST, FractionalResampler,
                                     _rational_of, resample_block,
                                     resample_block_rational)


def run_both(ratio, p, q, n=4096, mu_int=HIST, mu_frac=0, cap=None,
             n_valid=None, complex_=False, ratio_run=None):
    rng = np.random.default_rng(42)
    if complex_:
        x = (rng.standard_normal(HIST + n)
             + 1j * rng.standard_normal(HIST + n)).astype(np.complex64)
    else:
        x = rng.standard_normal(HIST + n).astype(np.float32)
    cap = cap or int(np.ceil(n / (ratio * 0.9))) + 1
    ii, ff = exact.ratio_to_fixed(ratio_run or ratio)
    args = (jnp.asarray(x), jnp.int32(mu_int), jnp.uint32(mu_frac),
            jnp.int32(ii), jnp.uint32(ff), cap, TAPS_TABLE)
    kw = {} if n_valid is None else dict(n_valid=jnp.int32(n_valid))
    y0, n0, mi0, mf0 = jax.jit(
        lambda *a: resample_block(*a, **kw), static_argnums=(5,))(*args)
    y1, n1, mi1, mf1 = jax.jit(
        lambda *a: resample_block_rational(*a, p, q, **kw),
        static_argnums=(5,))(*args)
    assert int(n0) == int(n1)
    assert int(mi0) == int(mi1) and int(mf0) == int(mf1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=2e-6)
    return y0, n0


@pytest.mark.parametrize("ratio,p,q", [
    (400e3 / 48e3, 25, 3),       # the WBFM audio stage
    (10.0, 10, 1),               # integer decimation
    (32000 / 3000, 32, 3),
    (11.5, 23, 2),
    (250e3 / 48e3, 125, 24),     # BASELINE config 1 (row-gather taps)
    (653 / 61, 653, 61),         # large-q boundary
])
@pytest.mark.parametrize("mu_frac", [0, 0x40000000, 0xFFFFFFF0])
def test_value_parity(ratio, p, q, mu_frac):
    assert _rational_of(ratio) == (p, q)
    run_both(ratio, p, q, mu_frac=mu_frac)


def test_complex_parity():
    run_both(400e3 / 48e3, 25, 3, complex_=True)


def test_partial_block_parity():
    run_both(25 / 3, 25, 3, n_valid=1000)


def test_ppb_retune_stays_fast_and_exact():
    # run ratio differs from construction by +3 ppb: guard must hold
    # (fast path) and outputs must still match the generic path exactly
    ratio = 400e3 / 48e3
    run_both(ratio, 25, 3, ratio_run=ratio * (1 + 3e-9))


def test_wide_retune_falls_back_exactly():
    # +5% retune breaks the {-1,0,1} residual bound -> the cond must
    # take the generic branch and still be exact
    ratio = 400e3 / 48e3
    run_both(ratio, 25, 3, ratio_run=ratio * 1.05,
             cap=int(np.ceil(4096 / (ratio * 0.9))) + 1)


def test_negative_mu_falls_back():
    run_both(25 / 3, 25, 3, mu_int=-2)


def test_streaming_block_chain_matches_generic():
    """Block-by-block through the Block wrapper: fast-path streaming ==
    a generic-path streaming run, state and audio identical."""
    ratio = 400e3 / 48e3
    n, blocks = 2048, 6
    rng = np.random.default_rng(7)
    x = rng.standard_normal(n * blocks).astype(np.float32)

    def run(force_generic):
        rs = FractionalResampler(n, ratio, dtype=jnp.float32)
        if force_generic:
            rs.pq = None
        else:
            assert rs.pq == (25, 3)
        st = jax.tree_util.tree_map(jnp.asarray, rs.init_state())
        pr = rs.init_params()
        meta = StreamMeta.start(400e3)
        out = []
        ap = jax.jit(rs.apply)
        for i in range(blocks):
            st, (o,) = ap(st, pr,
                          Stream(jnp.asarray(x[i * n:(i + 1) * n]),
                                 jnp.int32(n), meta))
            out.append(np.asarray(o.data)[:int(o.count)])
        return np.concatenate(out)

    a = run(False)
    b = run(True)
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)


def test_non_rational_ratio_uses_generic():
    assert _rational_of(np.pi) is None        # irrational
    assert _rational_of(250e3 / 48e3) == (125, 24)
    assert _rational_of(1.5) is None          # p < window width
    rs = FractionalResampler(1024, np.pi, dtype=jnp.float32)
    assert rs.pq is None
