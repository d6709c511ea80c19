"""Exact integer phase/position arithmetic vs arbitrary-precision models."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.ops import exact


def test_phase_ramp_matches_python_ints():
    inc = exact.freq_to_turns_u32(1.2345e6, 3.2e6)
    phase0 = np.uint32(0xDEADBEEF)
    n = 4096
    ramp = np.asarray(exact.phase_ramp_u32(n, jnp.uint32(phase0), jnp.asarray(inc)))
    expect = [(int(phase0) + k * int(inc)) % 2 ** 32 for k in range(n)]
    assert ramp.tolist() == expect


def test_oscillator_phase_continuity():
    inc = exact.freq_to_turns_u32(-250e3, 2.0e6)
    lo1, p1 = exact.oscillator(1024, jnp.uint32(0), jnp.asarray(inc))
    lo2, _ = exact.oscillator(1024, p1, jnp.asarray(inc))
    both = np.concatenate([np.asarray(lo1), np.asarray(lo2)])
    lo_ref, _ = exact.oscillator(2048, jnp.uint32(0), jnp.asarray(inc))
    np.testing.assert_allclose(both, np.asarray(lo_ref), atol=1e-5)


def test_oscillator_no_longterm_drift():
    # After an exact number of periods the phase word must return to 0.
    fs, f = 1024.0, 32.0  # 32 cycles in 1024 samples, inc = 2^27 exactly
    inc = exact.freq_to_turns_u32(f, fs)
    assert int(inc) == 2 ** 27
    _, p_after = exact.oscillator(1024 * 1000, jnp.uint32(0), jnp.asarray(inc))
    assert int(np.asarray(p_after)) == 0


def test_fixed_positions_exact():
    ratio = 2.718281828459045
    ip, fr = exact.ratio_to_fixed(ratio)
    n = 8192
    idx, frac = exact.fixed_positions(n, jnp.uint32(123456789), ip, fr)
    idx, frac = np.asarray(idx), np.asarray(frac)
    # arbitrary-precision reference
    inc = int(ip) * 2 ** 32 + int(fr)
    for k in [0, 1, 2, 100, 5000, 8191]:
        p = 123456789 + k * inc
        assert idx[k] == p // 2 ** 32
        assert frac[k] == p % 2 ** 32


def test_fixed_positions_pure_fractional():
    # ratio < 1 (interpolation): int increments come only from carries
    ip, fr = exact.ratio_to_fixed(0.3333333333333333)
    idx, frac = exact.fixed_positions(1000, jnp.uint32(0), ip, fr)
    idx = np.asarray(idx)
    inc = int(fr)
    expect = [(k * inc) // 2 ** 32 for k in range(1000)]
    assert idx.tolist() == expect


def test_ratio_roundtrip_precision():
    for r in [0.1, 1.0, 1.5, 2.0 / 3.0, 48000.0 / 250000.0, 3.9999999]:
        ip, fr = exact.ratio_to_fixed(r)
        back = exact.fixed_to_ratio(ip, fr)
        assert abs(back - r) < 2 ** -32 + 1e-12


def test_ppb_message_interface():
    # reference handle_msg: ratio = (i + frac)/1e9
    ip, fr = exact.ppb_to_fixed(2_000_000_000, 0.5)
    assert int(ip) == 2
    assert abs(exact.fixed_to_ratio(ip, fr) - 2.0000000005) < 1e-9


def test_phase_bin_rounding():
    bins = exact.frac_to_phase_bin(jnp.asarray(
        [0, 2 ** 31, 2 ** 32 - 1, 2 ** 25 // 2 - 1, 2 ** 25 // 2 + 1],
        dtype=jnp.uint32))
    b = np.asarray(bins)
    assert b[0] == 0
    assert b[1] == 64
    assert b[2] == 128          # top of range rounds to the next-sample bin
    assert b[3] == 0 and b[4] == 1  # rounding boundary at half a step


def test_fixed_positions_closed_form_carries():
    """The limb-split closed-form carries equal big-int ground truth
    for adversarial mu/inc values (and the >2^16 cumsum path agrees)."""
    import numpy as np
    import jax.numpy as jnp
    from grbaz_tpu.ops import exact

    rng = np.random.default_rng(0)
    cases = [(0, 0, 5), (0xFFFFFFFF, 0xFFFFFFFF, 1000),
             (0x80000000, 0x55555555, 4096),
             (1, 0xFFFFFFFE, 65536)]
    for _ in range(6):
        cases.append((int(rng.integers(0, 2**32)),
                      int(rng.integers(0, 2**32)),
                      int(rng.integers(2, 3000))))
    for mu0, incf, n in cases:
        inci = int(rng.integers(0, 50))
        idx, frac = exact.fixed_positions(n, jnp.uint32(mu0),
                                          jnp.int32(inci),
                                          jnp.uint32(incf))
        idx = np.asarray(idx)
        frac = np.asarray(frac)
        for k in (0, 1, n // 2, n - 1):
            total = mu0 + k * incf
            assert int(frac[k]) == total % (2**32)
            assert int(idx[k]) == k * inci + (total >> 32), \
                f"mu0={mu0:#x} incf={incf:#x} k={k}"


def test_oscillator_chunked_matches_direct():
    """The outer-product LO equals the per-sample cos/sin form to ~ulp,
    for adversarial phases (wraps land inside chunks)."""
    import numpy as np
    import jax.numpy as jnp
    from grbaz_tpu.ops import exact

    for phase0, inc, n in [(0, 123456789, 4096),
                           (0xFFFFFF00, 0x80000001, 2048),
                           (0x12345678, 0xFFFFFFFF, 1024),
                           (7, 1, 64)]:
        lo, pa = exact.oscillator(n, jnp.uint32(phase0), jnp.uint32(inc))
        # direct reference
        k = np.arange(n, dtype=np.uint64)
        ph = (phase0 + k * inc) % (2 ** 32)
        ang = ph.astype(np.float64) * (2 * np.pi / 2 ** 32)
        ref = np.exp(1j * ang)
        np.testing.assert_allclose(np.asarray(lo), ref, atol=5e-6)
        assert int(pa) == (phase0 + n * inc) % (2 ** 32)
        assert float(np.max(np.abs(np.abs(np.asarray(lo)) - 1.0))) < 1e-5
