"""Pallas TPU kernels: frequency-translating decimating FIR.

The WBFM flagship chain's hot stage (reference flowgraph
/root/reference/samples/RTL-FM.grc: ``freq_xlating_fir_filter`` over the
full 3.2 MHz RTL stream; per-sample loop lib/baz_rtl_source_c.cc feeding
GR's fir_filter). The XLA polyphase path in :mod:`grbaz_tpu.ops.fir`
is numerically exact but materializes its ``[n_out, 2*n_phases]``
partial-product matrix to HBM (~84 MB round trip per 1M-sample block on
the WBFM shape — ~10x the useful traffic). These kernels keep the
partial products in VMEM: HBM sees the input once and the decimated
output once.

**r5 outcome: the v5 x-aligned kernel at the bottom of this file
(``xlating_fir_block_pallas_xal``) is the PRODUCTION channelizer on
TPU** (FreqXlatingFIRDecimator backend='auto'): 48 us/1M block vs
327 us for the XLA path, driving the chain to 4168.6 Msamp/s. The
earlier generations are kept for the record: v3 (rotated-taps,
``xlating_fir_frame_pallas``) still backs the fused WBFMFrontend
variant; v4 (``xlating_fir_frame_pallas_rtf``) demonstrated the
rotate-then-filter formulation but loses ~350 us to XLA-side frame
prep — the finding that shaped v5.

Hard-won layout facts baked into these designs (v3-v5, measured on
v5e; the r5 additions are in .claude/skills/verify/SKILL.md):

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


def _pick_tile2_rtf(r2: int) -> int:
    """Packed-row tile for the v4 kernel. Grid-step fixed overhead
    (~2-3 us/step) dominated the v3/v4.0 measurements (128 steps of
    tile2=64 -> ~390 us floor with the kernel body near-empty), so v4
    uses the largest tile that divides r2 — live buffers are a few
    [tile2+8, 128] f32 planes, so even 1024 packed rows is ~4 MB of
    VMEM, well under the 16 MB budget. GRBAZ_RTF_TILE2 overrides for
    experiments."""
    import os
    env = os.environ.get("GRBAZ_RTF_TILE2")
    if env:
        t = int(env)
    else:
        t = min(r2, 1024)
    while r2 % t or t % 8:
        t //= 2
    return max(t, 8)


def _kernel_rtf(sc_ref, zr_ref, zi_ref, h_ref, s_ref, zr_halo, zi_halo,
                yr_ref, yi_ref, *, n_phases_pad: int, decim: int,
                precision, tile2: int):
    cpm = n_phases_pad
    rpr = 128 // decim
    zr = jnp.concatenate([zr_ref[:], zr_halo[:]], axis=0)
    zi = jnp.concatenate([zi_ref[:], zi_halo[:]], axis=0)
    rows = zr.shape[0]

    # Per-tile LO synthesis, outer-product factored: sample j = 128*r + l
    # has phase base + j*inc = (base + r*128*inc) + l*inc, so
    # lo(j) = lo_row(r) * lo_lane(l) — rows+128 transcendentals per tile
    # instead of rows*128 (Mosaic sin/cos measured ~200 us/1M-block at
    # full rate; the factored form is ~50x fewer). Both phase parts stay
    # exact uint32 turns; only the f32 angle conversion rounds, same as
    # the XLA path. (In XLA the same factorization LOST — it
    # materializes the outer product to HBM; in VMEM it's free.)
    # Mosaic has no u32->f32 cast; bitcast to i32 (sin/cos are 2pi-
    # periodic, so the signed whole-turn shift is harmless).
    i = pl.program_id(0)
    base = sc_ref[0]               # phase of frame sample 0
    inc = sc_ref[1]
    to_rad = jnp.float32(2.0 * np.pi / 4294967296.0)
    row = jax.lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)
    ph_r = base + (jnp.uint32(i) * jnp.uint32(tile2) + row) \
        * (jnp.uint32(128) * inc)
    ang_r = pltpu.bitcast(ph_r, jnp.int32).astype(jnp.float32) * to_rad
    ang_l = pltpu.bitcast(lane * inc, jnp.int32).astype(jnp.float32) \
        * to_rad
    cr, sr = jnp.cos(ang_r), jnp.sin(ang_r)
    cl, sl = jnp.cos(ang_l), jnp.sin(ang_l)
    c = cr * cl - sr * sl
    s = cr * sl + sr * cl
    wr = zr * c - zi * s
    wi = zr * s + zi * c

    def dot(a, b_mat):
        return jnp.dot(a, b_mat, precision=precision,
                       preferred_element_type=jnp.float32)

    qr = _align_bands(dot(wr, h_ref[:]), n_phases_pad, cpm, rpr)
    qi = _align_bands(dot(wi, h_ref[:]), n_phases_pad, cpm, rpr)
    # TRANSPOSED output [rpr, tile2]: a [tile2, rpr] block has a 16-lane
    # minor dim, which DMAs at ~64 B/row (the r4 narrow-block trap —
    # measured ~100 us/1M-block of pure output-write cost); the
    # transposed band-sum keeps the minor dim at tile2 lanes.
    nr = yr_ref.shape[1]
    dn = (((0,), (1,)), ((), ()))   # contract s rows with q lanes
    yr_ref[:] = jax.lax.dot_general(s_ref[:], qr[:nr],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
    yi_ref[:] = jax.lax.dot_general(s_ref[:], qi[:nr],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)


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
    out = pl.BlockSpec((rpr, tile2), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[scs, main, main, const(h_mat), const(s_mat),
                  halo, halo],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((rpr, r2), jnp.float32),
                   jax.ShapeDtypeStruct((rpr, r2), jnp.float32)),
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

    tile2 = _pick_tile2_rtf(n_out // rpr)
    yr, yi = _run_rtf(scal, zr2, zi2, h_mat, s_mat, tile2=tile2,
                      n_phases_pad=n_phases_pad, decim=decim,
                      precision=precision, interpret=interpret)
    # outputs come back transposed [rpr, r2] (128-lane write blocks);
    # k = r*rpr + g  ->  y = transpose + flatten (XLA-side, fuses into
    # the consumer)
    return jax.lax.complex(yr.T.reshape(-1)[:n_out],
                           yi.T.reshape(-1)[:n_out])


# ---------------------------------------------------------------------------
# v5 (r5): x-ALIGNED rotate-then-filter — zero XLA-side copies.
#
# The v4 kernel was measured at ~42 us/1M-block — but only when its
# input planes arrive in [rows, 128] layout. Fed from the streaming
# frame (concat(tail, x) + pad, misaligned by tpad-1), the XLA-side
# copies and relayouts cost ~350 us, swamping the kernel. v5 removes
# every copy: the kernel reads x's own planes ([n/128, 128] reshape of
# the block — layout-identical), the carried tail rides a tiny [8,128]
# operand selected into grid step 0's backward halo, and the
# tail/x sample offset (history length tpad-1 = MD-1) folds into the
# tap matrix as a shifted-column + wrap-column pair (the
# fir_decimate_tail_block A|B trick, lib-free in packed form):
#
#     y[k] = sum_{m,c} h2[m, c] x[D(k + m - M) + c + 1]
#          = sum_{b=0..M} qc[k - b, b]      (combined A|B bands)
#
# with qc = z @ Tc one matmul per plane and the band alignment running
# BACKWARD (output row r reads q rows r-1, r — the pre-halo).
# ---------------------------------------------------------------------------


def _align_bands_back(q, nbands_pad: int, cpm: int, rpr: int):
    """Aligned[r, g*cpm + m] = Q[(r*rpr + g - m) folded, m]."""
    n_rows, n_lanes = q.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    g = lane // cpm
    m = lane % cpm
    b = 1
    while b < nbands_pad:
        if b % rpr == 0:
            rolled = pltpu.roll(q, b // rpr, 0)
        else:
            sh = (b * cpm) % n_lanes
            a_same = pltpu.roll(q, sh, 1)
            a_prev = pltpu.roll(pltpu.roll(q, 1, 0), sh, 1)
            rolled = jnp.where((g - (b % rpr)) < 0, a_prev, a_same)
        q = jnp.where((m & b) != 0, rolled, q)
        b <<= 1
    return q


def xaligned_tap_matrix(h_rev_pad, decim: int, nbands_pad: int):
    """Packed A|B tap matrix for the x-aligned formulation.

    Band b of output k accumulates taps applied to x polyphase row
    k - b: Tc[g*decim + i, g*cpm + b] = h2[M-b, i-1] (shifted columns,
    i >= 1, b >= 1) + h2[M-b-1, decim-1] for i == 0 (the wrap column),
    where h2[m, c] = h_rev_pad[m*decim + c] and M = tpad/decim.
    """
    h_rev_pad = np.asarray(h_rev_pad, np.float32)
    tpad = h_rev_pad.shape[0]
    m_ph = tpad // decim
    rpr = 128 // decim
    cpm = nbands_pad
    h2 = h_rev_pad.reshape(m_ph, decim)
    t = np.zeros((128, rpr * cpm), np.float32)
    for g in range(rpr):
        for i in range(decim):
            for b in range(cpm):
                v = 0.0
                mm = m_ph - b          # A part: m = M - b
                if i >= 1 and 0 <= mm < m_ph:
                    v += h2[mm, i - 1]
                mb = m_ph - b - 1      # B part: wrap column of band b
                if i == 0 and 0 <= mb < m_ph:
                    v += h2[mb, decim - 1]
                t[g * decim + i, g * cpm + b] = v
    return t


def _kernel_xal(sc_ref, zr_ref, zi_ref, pr_r, pr_i, t8r, t8i,
                h_ref, s_ref, yr_ref, yi_ref, *, nbands_pad: int,
                decim: int, precision, tile2: int):
    cpm = nbands_pad
    rpr = 128 // decim
    i = pl.program_id(0)
    # backward halo: 8 packed rows before the tile; grid step 0 takes
    # the carried tail block instead
    use_t8 = (i == 0)
    pre_r = jnp.where(use_t8, t8r[:], pr_r[:])
    pre_i = jnp.where(use_t8, t8i[:], pr_i[:])
    zr = jnp.concatenate([pre_r, zr_ref[:]], axis=0)
    zi = jnp.concatenate([pre_i, zi_ref[:]], axis=0)
    rows = zr.shape[0]

    # outer-product LO synthesis on x-aligned sample indices: row rr of
    # the concatenated tile is x packed row (i*tile2 + rr - 8), which
    # is NEGATIVE for step 0's tail rows — uint32 turn arithmetic wraps
    # correctly through the bitcast.
    base = sc_ref[0]
    inc = sc_ref[1]
    to_rad = jnp.float32(2.0 * np.pi / 4294967296.0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    j_row = (jnp.int32(i) * jnp.int32(tile2) + row_i
             - jnp.int32(8)) * jnp.int32(128)
    ph_r = base + pltpu.bitcast(j_row, jnp.uint32) * inc
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)
    ang_r = pltpu.bitcast(ph_r, jnp.int32).astype(jnp.float32) * to_rad
    ang_l = pltpu.bitcast(lane * inc, jnp.int32).astype(jnp.float32) \
        * to_rad
    cr, sr = jnp.cos(ang_r), jnp.sin(ang_r)
    cl, sl = jnp.cos(ang_l), jnp.sin(ang_l)
    c = cr * cl - sr * sl
    s = cr * sl + sr * cl
    wr = zr * c - zi * s
    wi = zr * s + zi * c

    def dot(a, b_mat):
        return jnp.dot(a, b_mat, precision=precision,
                       preferred_element_type=jnp.float32)

    qr = _align_bands_back(dot(wr, h_ref[:]), nbands_pad, cpm, rpr)
    qi = _align_bands_back(dot(wi, h_ref[:]), nbands_pad, cpm, rpr)
    nr = yr_ref.shape[1]
    dn = (((0,), (1,)), ((), ()))   # transposed band sum (128-lane out)
    yr_ref[:] = jax.lax.dot_general(s_ref[:], qr[8:8 + nr],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
    yi_ref[:] = jax.lax.dot_general(s_ref[:], qi[8:8 + nr],
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)


@functools.partial(jax.jit, static_argnames=(
    "tile2", "nbands_pad", "decim", "precision", "interpret"))
def _run_xal(scal, zr2, zi2, t8r, t8i, h_mat, s_mat, *, tile2: int,
             nbands_pad: int, decim: int, precision: str,
             interpret: bool):
    rpr = 128 // decim
    r2 = zr2.shape[0]
    grid = r2 // tile2
    prec = dict(default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGHEST,
                highest=jax.lax.Precision.HIGHEST)[precision]
    kern = functools.partial(_kernel_xal, nbands_pad=nbands_pad,
                             decim=decim, precision=prec, tile2=tile2)
    scs = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)
    main = pl.BlockSpec((tile2, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    # pre-halo: the 8 packed rows before the tile (clamped at step 0 —
    # the kernel substitutes the tail operand there)
    pre = pl.BlockSpec(
        (8, 128),
        lambda i: (jnp.maximum(i * (tile2 // 8) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.BlockSpec((rpr, tile2), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[scs, main, main, pre, pre, const(t8r), const(t8i),
                  const(h_mat), const(s_mat)],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((rpr, r2), jnp.float32),
                   jax.ShapeDtypeStruct((rpr, r2), jnp.float32)),
        interpret=interpret,
    )(scal, zr2, zi2, zr2, zi2, t8r, t8i, h_mat, s_mat)
    return yr, yi


def xlating_fir_block_pallas_xal(x: jax.Array, tail: jax.Array,
                                 h_rev_pad, decim: int,
                                 phase0: jax.Array, lo_inc: jax.Array, *,
                                 precision: str = "default",
                                 interpret: bool = False) -> jax.Array:
    """x-aligned rotate-then-filter channelizer; ROTATED output.

    ``x`` is the NEW block (no history concat — its [n/128, 128] plane
    views go straight to the kernel); ``tail`` carries the previous
    TPAD samples (fir_decimate_tail_block convention: tail[1:] is the
    filter history); ``phase0`` is the uint32 turn phase of x[0].
    Returns the n/decim rotated channel outputs, equal to the
    production XLA path up to f32 regrouping.
    """
    tpad = h_rev_pad.shape[0]
    n = x.shape[0]
    assert supported(n, decim), "unsupported shape for fused kernel"
    assert n % 128 == 0
    n_out = n // decim
    m_ph = tpad // decim
    nbands = m_ph + 1
    nbands_pad = _round_up(nbands, 4)
    rpr = 128 // decim
    assert nbands_pad <= cpm_limit(rpr), "tap span exceeds halo budget"

    h_mat = jnp.asarray(xaligned_tap_matrix(h_rev_pad, decim, nbands_pad))
    cpm = nbands_pad
    s_np = np.zeros((rpr * cpm, rpr), np.float32)
    for gi in range(rpr):
        s_np[gi * cpm + np.arange(cpm), gi] = 1.0
    s_mat = jnp.asarray(s_np)

    xc = x.astype(jnp.complex64)
    zr2 = xc.real.reshape(-1, 128)
    zi2 = xc.imag.reshape(-1, 128)
    # tail block: 8 packed rows ending just before x[0] — the last
    # tpad-1 lanes carry tail[1:], everything earlier is never read
    # (bands reach back at most tpad-1 samples)
    t8 = jnp.zeros((1024,), jnp.complex64).at[1024 - (tpad - 1):].set(
        tail.astype(jnp.complex64)[1:])
    t8r = t8.real.reshape(8, 128)
    t8i = t8.imag.reshape(8, 128)

    scal = jnp.stack([phase0.astype(jnp.uint32),
                      lo_inc.astype(jnp.uint32)])
    tile2 = _pick_tile2_rtf(n // 128)
    yr, yi = _run_xal(scal, zr2, zi2, t8r, t8i, h_mat, s_mat,
                      tile2=tile2, nbands_pad=nbands_pad, decim=decim,
                      precision=precision, interpret=interpret)
    return jax.lax.complex(yr.T.reshape(-1)[:n_out],
                           yi.T.reshape(-1)[:n_out])


def cpm_limit(rpr: int) -> int:
    """Backward band reach must stay within one packed pre-row block."""
    return 8 * rpr


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
