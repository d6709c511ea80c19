"""Fused Pallas TPU kernel: frequency-translating decimating FIR.

The WBFM flagship chain's hot stage (reference flowgraph
/root/reference/samples/RTL-FM.grc: ``freq_xlating_fir_filter`` over the
full 3.2 MHz RTL stream; per-sample loop lib/baz_rtl_source_c.cc feeding
GR's fir_filter). The XLA polyphase path in :mod:`grbaz_tpu.ops.fir`
is numerically exact but materializes its ``[n_out, 2*n_phases]``
partial-product matrix to HBM (~84 MB round trip per 1M-sample block on
the WBFM shape — ~10x the useful traffic). This kernel keeps the
partial products in VMEM: HBM sees the input once and the decimated
output once.

Hard-won layout facts baked into this design (v3 — measured on v5e):

* **Never bitcast complex64 to interleaved f32.** TPU XLA stores
  complex arrays as separate real/imaginary planes; the interleaved
  ``.view(float32)`` lowers to two full-length scatters — measured
  9.9 ms for a 1M-sample block, which silently dominated both earlier
  kernel versions (r3's banded kernel and this file's v2). ``.real`` /
  ``.imag`` / ``lax.complex`` are the free plane accessors. All kernel
  I/O is therefore plane-separated f32.

* **Keep VMEM block minor dims at 128 lanes.** Narrow blocks (e.g. the
  polyphase ``[rows, 2*decim]`` view) transfer at ~64 B/row.

* **Tiles of ~1024 polyphase rows.** 4096-row tiles exhaust VMEM and
  hang the chip (no compile-time error through this attachment).

Formulation:

* LO folded into the taps (the rotated-taps identity of
  ``ops.fir.xlating_fir_decimate_frame``): complex taps
  ``g[t] = h_rev[t] * exp(j*2*pi*(t - (tpad-1))*lo_inc / 2^32)``; the
  output-side rotation ``exp(j*beta(k))`` is NOT applied here — the
  caller either applies it (generic channelizer) or cancels it into the
  FM discriminator's constant phase offset (WBFM chain; see
  :func:`grbaz_tpu.models.wbfm` fused path). No full-rate sin/cos.

* Polyphase partial products as PACKED-LAYOUT matmuls. Each f32 plane
  reshapes (freely) to ``[rows/rpr, 128]`` where a packed row holds
  ``rpr = 128/decim`` consecutive polyphase rows of ``decim`` samples.
  Against block-diagonal tap matrices ``Tr/Ti[g*decim + i, g*cpm + m] =
  re/im g[m*decim + i]`` (one diagonal block per subrow g), four MXU
  dots give the complex partials in the same packed layout:
  ``Q[r, g*cpm + m] = partial_m(r*rpr + g)``.

* Band sum in VMEM on the packed layout: output ``k`` needs
  ``sum_m partial_m(k + m)``, i.e. column m shifts up by m polyphase
  rows. Done bit-by-bit with full-width ``pltpu.roll``s: a shift of
  ``b < rpr`` rows is a lane rotation by ``b*cpm`` (+ a row carry on
  the groups that wrap), ``b`` a multiple of ``rpr`` is a pure row
  roll; lane-iota masks select the columns whose m has bit b set.

* A final tiny dot against the 0/1 selection matrix ``S[g*cpm + m, g]``
  sums the bands; outputs leave as packed ``[rows/rpr, rpr]`` f32
  planes that reshape freely to ``y_re/y_im[n_out]``.

Precision: ``precision`` selects the Mosaic matmul decomposition —
``'high'`` aliases lax.Precision.HIGHEST (full f32-quality passes —
Mosaic's dot lowering rejects HIGH) or ``'default'`` (1-pass bf16,
~54 dB SNR, matching the 8-bit-ADC dynamic range of the RTL dongles the
reference serves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grbaz_tpu.ops import exact

# band margin in polyphase rows (max tap-bank up-shift supported)
HALO = 32


def rotated_taps(h_rev_pad: jax.Array, lo_inc: jax.Array) -> jax.Array:
    """Complex taps g[t] = h_rev[t] * exp(j*ang((t - (tpad-1)) * lo_inc)).

    Matches ops.fir.xlating_fir_decimate_frame's tap construction
    exactly (same uint32 turn arithmetic).
    """
    tpad = h_rev_pad.shape[0]
    t_idx = jnp.arange(tpad, dtype=jnp.uint32)
    rel = (t_idx - jnp.uint32(tpad - 1)) * lo_inc.astype(jnp.uint32)
    ang = exact.turns_u32_to_radians(rel)
    return h_rev_pad.astype(jnp.float32) * jax.lax.complex(jnp.cos(ang),
                                                           jnp.sin(ang))


def packed_tap_matrix(g_plane: jax.Array, decim: int,
                      n_phases_pad: int) -> jax.Array:
    """Block-diagonal packed tap matrix [128, rpr*cpm] for one plane:
    T[gi*decim + i, gi*cpm + m] = g_plane[m*decim + i]."""
    tpad = g_plane.shape[0]
    rpr = 128 // decim
    cpm = n_phases_pad
    rows = jnp.arange(128, dtype=jnp.int32)[:, None]
    cols = jnp.arange(rpr * cpm, dtype=jnp.int32)[None, :]
    gi_r, i = rows // decim, rows % decim
    gi_c, m = cols // cpm, cols % cpm
    t = m * decim + i
    valid = (gi_r == gi_c) & (t < tpad)
    tc = jnp.clip(t, 0, tpad - 1)
    return jnp.where(valid, g_plane.astype(jnp.float32)[tc], 0.0)


def _align_bands(q, n_phases_pad: int, cpm: int, rpr: int):
    """Aligned[r, g*cpm + m] = Q[(r*rpr + g + m) folded, m]."""
    n_rows, n_lanes = q.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    g = lane // cpm
    m = lane % cpm
    b = 1
    while b < n_phases_pad:
        if b % rpr == 0:
            rolled = pltpu.roll(q, n_rows - b // rpr, 0)
        else:
            sh = (b * cpm) % n_lanes
            a_same = pltpu.roll(q, n_lanes - sh, 1)
            a_next = pltpu.roll(pltpu.roll(q, n_rows - 1, 0),
                                n_lanes - sh, 1)
            rolled = jnp.where((g + (b % rpr)) >= rpr, a_next, a_same)
        q = jnp.where((m & b) != 0, rolled, q)
        b <<= 1
    return q


def _kernel(zr_ref, zi_ref, hr_ref, hi_ref, s_ref,
            zr_halo, zi_halo, yr_ref, yi_ref, *, n_phases_pad: int,
            decim: int, precision):
    cpm = n_phases_pad
    rpr = 128 // decim
    zr = jnp.concatenate([zr_ref[:], zr_halo[:]], axis=0)
    zi = jnp.concatenate([zi_ref[:], zi_halo[:]], axis=0)

    def dot(a, b_mat):
        return jnp.dot(a, b_mat, precision=precision,
                       preferred_element_type=jnp.float32)

    qr = dot(zr, hr_ref[:]) - dot(zi, hi_ref[:])
    qi = dot(zr, hi_ref[:]) + dot(zi, hr_ref[:])
    qr = _align_bands(qr, n_phases_pad, cpm, rpr)
    qi = _align_bands(qi, n_phases_pad, cpm, rpr)
    nr = yr_ref.shape[0]
    yr_ref[:] = dot(qr[:nr], s_ref[:])
    yi_ref[:] = dot(qi[:nr], s_ref[:])


@functools.partial(jax.jit, static_argnames=(
    "tile2", "n_phases_pad", "decim", "precision", "interpret"))
def _run(zr2: jax.Array, zi2: jax.Array, hr: jax.Array, hi: jax.Array,
         s_mat: jax.Array, *, tile2: int, n_phases_pad: int, decim: int,
         precision: str, interpret: bool):
    rpr = 128 // decim
    r2 = zr2.shape[0] - 8          # packed rows of real output
    grid = r2 // tile2
    prec = dict(default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGHEST,
                highest=jax.lax.Precision.HIGHEST)[precision]
    kern = functools.partial(_kernel, n_phases_pad=n_phases_pad,
                             decim=decim, precision=prec)
    main = pl.BlockSpec((tile2, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((8, 128), lambda i: ((i + 1) * (tile2 // 8), 0),
                        memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.BlockSpec((tile2, rpr), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[main, main, const(hr), const(hi), const(s_mat),
                  halo, halo],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((r2, rpr), jnp.float32),
                   jax.ShapeDtypeStruct((r2, rpr), jnp.float32)),
        interpret=interpret,
    )(zr2, zi2, hr, hi, s_mat, zr2, zi2)
    return yr, yi


def supported(n_new: int, decim: int) -> bool:
    """True if the fused kernel handles this (block size, decim) shape."""
    if decim < 2 or decim > 64 or 128 % decim or n_new % decim:
        return False
    rpr = 128 // decim
    n_out = n_new // decim
    quantum = 8 * rpr * 8          # min tile2 of 8 packed rows, 8 tiles
    return n_out % quantum == 0


def _pick_tile2(r2: int) -> int:
    """Packed-row tile: 64 packed rows x 128 lanes x ~6 live buffers
    stays well inside VMEM (1024-polyphase-row tiles; 4096 hangs)."""
    t = min(r2, 64)
    while r2 % t or t % 8:
        t //= 2
    return max(t, 8)


def xlating_fir_frame_pallas(frame: jax.Array, h_rev_pad: jax.Array,
                             decim: int, lo_inc: jax.Array, *,
                             precision: str = "high",
                             interpret: bool = False) -> jax.Array:
    """Frequency-translating decimating FIR over a frame; UNROTATED output.

    ``frame`` is complex64 with ``tpad-1`` leading history (RAW samples —
    the LO lives in the taps). Returns ``yf[n_out]`` complex64 satisfying

        y_rotated[k] = yf[k] * exp(j*2*pi*u32(phase0 + k*decim*lo_inc)/2^32)

    where ``y_rotated`` equals ops.fir's rotate-then-filter output
    (f32 rounding aside). Callers either rotate (generic) or cancel the
    rotation into downstream phase-difference ops (FM demod).
    """
    tpad = h_rev_pad.shape[0]
    n_new = frame.shape[0] - (tpad - 1)
    assert supported(n_new, decim), "unsupported shape for fused kernel"
    n_out = n_new // decim
    n_phases = tpad // decim
    n_phases_pad = _round_up(n_phases, 4)
    rpr = 128 // decim
    assert n_phases_pad <= HALO, "tap span exceeds the halo budget"
    assert n_phases_pad + rpr - 1 <= 8 * rpr, \
        "folded band shift exceeds the packed halo rows"

    g = rotated_taps(jnp.asarray(h_rev_pad, jnp.float32), lo_inc)
    hr = packed_tap_matrix(g.real, decim, n_phases_pad)
    hi = packed_tap_matrix(g.imag, decim, n_phases_pad)
    cpm = n_phases_pad
    s_np = np.zeros((rpr * cpm, rpr), np.float32)
    for gi in range(rpr):
        s_np[gi * cpm + np.arange(cpm), gi] = 1.0
    s_mat = jnp.asarray(s_np)

    # plane-separated packed polyphase rows (all reshapes of the free
    # .real/.imag plane accessors — see the layout notes up top). 8
    # packed rows (= 8*rpr >= HALO + rpr - 1 polyphase rows) of zero
    # tail keep the per-tile halo block in bounds.
    need = (n_out + 8 * rpr) * decim
    pad = need - frame.shape[0]
    fc = frame.astype(jnp.complex64)
    if pad > 0:
        fc = jnp.concatenate([fc, jnp.zeros((pad,), jnp.complex64)])
    zr2 = fc.real.reshape(-1, 128)
    zi2 = fc.imag.reshape(-1, 128)

    tile2 = _pick_tile2(n_out // rpr)
    yr, yi = _run(zr2, zi2, hr, hi, s_mat, tile2=tile2,
                  n_phases_pad=n_phases_pad, decim=decim,
                  precision=precision, interpret=interpret)
    # packed [r, g] -> output k = r*rpr + g: a free row-major reshape
    return jax.lax.complex(yr.reshape(-1)[:n_out], yi.reshape(-1)[:n_out])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# v4 (r5): rotate-then-filter formulation — the kernel twin of the
# PRODUCTION XLA path (exact.oscillator + input rotation +
# fir_decimate_tail_block), which won r4's A/B against the rotated-taps
# identity (1637 vs 1220 Msamp/s chain). The LO is synthesized INSIDE
# the kernel per tile (uint32 turn phase -> sin/cos on the VPU), the
# rotation happens in VMEM, and the polyphase contraction uses REAL tap
# matrices — 2 MXU dots instead of the complex-tap form's 4. HBM sees
# the input planes once and the decimated output once.
# ---------------------------------------------------------------------------


def _kernel_rtf(sc_ref, zr_ref, zi_ref, h_ref, s_ref, zr_halo, zi_halo,
                yr_ref, yi_ref, *, n_phases_pad: int, decim: int,
                precision, tile2: int):
    cpm = n_phases_pad
    rpr = 128 // decim
    zr = jnp.concatenate([zr_ref[:], zr_halo[:]], axis=0)
    zi = jnp.concatenate([zi_ref[:], zi_halo[:]], axis=0)
    rows = zr.shape[0]

    # per-tile LO synthesis: sample index j -> uint32 turn phase
    i = pl.program_id(0)
    base = sc_ref[0]               # phase of frame sample 0
    inc = sc_ref[1]
    row = jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 1)
    j = (jnp.uint32(i) * jnp.uint32(tile2) + row) * jnp.uint32(128) + lane
    ang = (base + j * inc).astype(jnp.float32) \
        * jnp.float32(2.0 * np.pi / 4294967296.0)
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    wr = zr * c - zi * s
    wi = zr * s + zi * c

    def dot(a, b_mat):
        return jnp.dot(a, b_mat, precision=precision,
                       preferred_element_type=jnp.float32)

    qr = _align_bands(dot(wr, h_ref[:]), n_phases_pad, cpm, rpr)
    qi = _align_bands(dot(wi, h_ref[:]), n_phases_pad, cpm, rpr)
    nr = yr_ref.shape[0]
    yr_ref[:] = dot(qr[:nr], s_ref[:])
    yi_ref[:] = dot(qi[:nr], s_ref[:])


@functools.partial(jax.jit, static_argnames=(
    "tile2", "n_phases_pad", "decim", "precision", "interpret"))
def _run_rtf(scal: jax.Array, zr2: jax.Array, zi2: jax.Array,
             h_mat: jax.Array, s_mat: jax.Array, *, tile2: int,
             n_phases_pad: int, decim: int, precision: str,
             interpret: bool):
    rpr = 128 // decim
    r2 = zr2.shape[0] - 8
    grid = r2 // tile2
    prec = dict(default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGHEST,
                highest=jax.lax.Precision.HIGHEST)[precision]
    kern = functools.partial(_kernel_rtf, n_phases_pad=n_phases_pad,
                             decim=decim, precision=prec, tile2=tile2)
    scs = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)
    main = pl.BlockSpec((tile2, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((8, 128), lambda i: ((i + 1) * (tile2 // 8), 0),
                        memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.BlockSpec((tile2, rpr), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[scs, main, main, const(h_mat), const(s_mat),
                  halo, halo],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((r2, rpr), jnp.float32),
                   jax.ShapeDtypeStruct((r2, rpr), jnp.float32)),
        interpret=interpret,
    )(scal, zr2, zi2, h_mat, s_mat, zr2, zi2)
    return yr, yi


def xlating_fir_frame_pallas_rtf(frame: jax.Array, h_rev_pad,
                                 decim: int, phase0: jax.Array,
                                 lo_inc: jax.Array, *,
                                 precision: str = "default",
                                 interpret: bool = False) -> jax.Array:
    """Rotate-then-filter channelizer kernel; ROTATED output.

    Same contract as the production XLA path (exact.oscillator + rotate
    + fir_decimate_tail_block): ``frame`` is complex64 with ``tpad-1``
    leading UNROTATED history, ``phase0`` the uint32 turn phase of the
    first NEW sample; returns the decimated rotated channel signal.
    """
    tpad = h_rev_pad.shape[0]
    n_new = frame.shape[0] - (tpad - 1)
    assert supported(n_new, decim), "unsupported shape for fused kernel"
    n_out = n_new // decim
    n_phases = tpad // decim
    n_phases_pad = _round_up(n_phases, 4)
    rpr = 128 // decim
    assert n_phases_pad + rpr - 1 <= 8 * rpr

    h_mat = packed_tap_matrix(jnp.asarray(h_rev_pad, jnp.float32),
                              decim, n_phases_pad)
    cpm = n_phases_pad
    s_np = np.zeros((rpr * cpm, rpr), np.float32)
    for gi in range(rpr):
        s_np[gi * cpm + np.arange(cpm), gi] = 1.0
    s_mat = jnp.asarray(s_np)

    need = (n_out + 8 * rpr) * decim
    pad = need - frame.shape[0]
    fc = frame.astype(jnp.complex64)
    if pad > 0:
        fc = jnp.concatenate([fc, jnp.zeros((pad,), jnp.complex64)])
    zr2 = fc.real.reshape(-1, 128)
    zi2 = fc.imag.reshape(-1, 128)

    # phase of frame sample 0 (history reaches tpad-1 samples back)
    ph_f0 = phase0.astype(jnp.uint32) \
        - jnp.uint32(tpad - 1) * lo_inc.astype(jnp.uint32)
    scal = jnp.stack([ph_f0, lo_inc.astype(jnp.uint32)])

    tile2 = _pick_tile2(n_out // rpr)
    yr, yi = _run_rtf(scal, zr2, zi2, h_mat, s_mat, tile2=tile2,
                      n_phases_pad=n_phases_pad, decim=decim,
                      precision=precision, interpret=interpret)
    return jax.lax.complex(yr.reshape(-1)[:n_out], yi.reshape(-1)[:n_out])


def rotate_output(yf: jax.Array, phase0: jax.Array, lo_inc: jax.Array,
                  decim: int) -> jax.Array:
    """Apply the deferred output rotation exp(j*beta(k))."""
    n_out = yf.shape[0]
    k = jnp.arange(n_out, dtype=jnp.uint32)
    ph = phase0.astype(jnp.uint32) + k * (jnp.uint32(decim)
                                          * lo_inc.astype(jnp.uint32))
    ang = exact.turns_u32_to_radians(ph)
    return yf * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def demod_unrotated(yf: jax.Array, prev_yf: jax.Array, gain: jax.Array,
                    lo_inc: jax.Array, decim: int) -> tuple:
    """FM quadrature demod of the ROTATED signal, computed from the
    unrotated kernel output: since the rotation advances by a constant
    ``delta = 2*pi*u32(decim*lo_inc)/2^32`` per output sample,

        arg(Y[k] conj(Y[k-1])) = wrap(arg(yf[k] conj(yf[k-1])) + delta).

    Returns ``(d[n_out], last_yf)``. Exact-phase: delta uses the same
    uint32 turn arithmetic as the rotation it replaces.
    """
    delta = exact.turns_u32_to_radians(
        jnp.uint32(decim) * lo_inc.astype(jnp.uint32))
    # map delta into (-pi, pi] so the wrapped sum stays in one branch
    two_pi = jnp.float32(2.0 * np.pi)
    delta = delta - jnp.where(delta > jnp.float32(np.pi), two_pi, 0.0)
    shifted = jnp.concatenate([prev_yf[None], yf[:-1]])
    prod = yf * jnp.conj(shifted)
    theta = jnp.arctan2(prod.imag, prod.real) + delta
    theta = theta - jnp.where(theta > jnp.float32(np.pi), two_pi, 0.0)
    theta = theta + jnp.where(theta < jnp.float32(-np.pi), two_pi, 0.0)
    # zero product (e.g. squelch-gated samples): arg() of the rotated
    # product is atan2(0, 0) == 0, not the rotation offset
    theta = jnp.where((prod.real == 0) & (prod.imag == 0),
                      jnp.float32(0), theta)
    return theta.astype(jnp.float32) * gain, yf[-1]
