"""Fused Pallas TPU kernel: frequency-translating decimating FIR.

The WBFM flagship chain's hot stage (reference flowgraph
/root/reference/samples/RTL-FM.grc: ``freq_xlating_fir_filter`` over the
full 3.2 MHz RTL stream; per-sample loop lib/baz_rtl_source_c.cc feeding
GR's fir_filter). The XLA polyphase path in :mod:`grbaz_tpu.ops.fir`
is numerically exact but materializes its ``[n_out, 2*n_phases]``
partial-product matrix to HBM (~84 MB round trip per 1M-sample block on
the WBFM shape) — measured chain time matches that HBM traffic almost
exactly. This kernel keeps every intermediate in VMEM.

Formulation (TPU-first, not a translation):

* LO folded into the taps (the rotated-taps identity of
  ``ops.fir.xlating_fir_decimate_frame``): complex taps
  ``g[t] = h_rev[t] * exp(j*2*pi*(t - (tpad-1))*lo_inc / 2^32)``; the
  output-side rotation ``exp(j*beta(k))`` is NOT applied here — the
  caller either applies it (generic channelizer) or cancels it into the
  FM discriminator's constant phase offset (WBFM chain; see
  :func:`grbaz_tpu.models.wbfm` fused path). No full-rate sin/cos.

* Banded matmul over INTERLEAVED re/im lanes: the complex64 frame is
  bitcast to f32 pairs, reshaped ``[A+1, 2*RW]`` (RW samples per row) —
  both free layout ops. Output row a, column b (output k = a*128 + b)
  contracts lanes ``j = 2*(decim*b + t) + parity`` of the row pair
  ``(a, a+1)`` against banded tap matrices

      Rr[2*(decim*b+t), b]   =  re g[t]     Rr[odd j] = -im g[t]
      Ri[2*(decim*b+t), b]   =  im g[t]     Ri[odd j] =  re g[t]

  so ``yr = X @ Rr`` and ``yi = X @ Ri`` are two MXU matmuls per tile
  with zero shuffling. The band costs ~7x MAC inflation but runs dense
  on the MXU — still ~30x fewer effective cycles than the K=8 polyphase
  contraction, and (the real win) zero HBM intermediates.

* Grid steps walk output row-tiles sequentially; the next-row halo is
  the same array through a second (1, 2*RW) BlockSpec. Tap matrices use
  constant index maps, so Pallas's pipeliner keeps them VMEM-resident
  across steps (no per-step re-DMA).

Precision: ``precision`` selects the Mosaic matmul decomposition —
``'high'`` (3-pass bf16, ~f32-quality products, the default) or
``'default'`` (1-pass bf16, ~54 dB SNR, matches the 8-bit-ADC source
dynamic range of the RTL dongles the reference serves).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grbaz_tpu.ops import exact

LANES = 128
# Halo block height: Mosaic requires sublane-dim block sizes divisible
# by 8; the kernel consumes only the first halo row, the rest is padding.
HALO_ROWS = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


def band_matrices(g: jax.Array, decim: int, k_lanes: int) -> tuple:
    """Banded interleaved tap matrices (Rr, Ri), each [k_lanes, 128].

    Rr[2*(decim*b+t)    , b] =  g.real[t]
    Rr[2*(decim*b+t) + 1, b] = -g.imag[t]
    Ri[2*(decim*b+t)    , b] =  g.imag[t]
    Ri[2*(decim*b+t) + 1, b] =  g.real[t]
    """
    tpad = g.shape[0]
    jj = jnp.arange(k_lanes, dtype=jnp.int32)[:, None]
    bb = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    u = jj // 2
    parity = jj % 2
    t = u - decim * bb
    valid = (t >= 0) & (t < tpad)
    tc = jnp.clip(t, 0, tpad - 1)
    gr = g.real.astype(jnp.float32)[tc]
    gi = g.imag.astype(jnp.float32)[tc]
    rr = jnp.where(valid, jnp.where(parity == 0, gr, -gi), 0.0)
    ri = jnp.where(valid, jnp.where(parity == 0, gi, gr), 0.0)
    return rr, ri


def _kernel(x_ref, halo_ref, rr_ref, ri_ref, yr_ref, yi_ref, *,
            tile_rows: int, k_lanes: int, row_lanes: int, precision):
    # halo block carries HALO_ROWS rows (Mosaic needs sublane-dim blocks
    # divisible by 8); only its row 0 — the next tile's first row — is
    # ever consumed.
    zfull = jnp.concatenate([x_ref[:], halo_ref[:]], axis=0)  # [TR+H, 2RW]
    # rolled[r] = zfull[r+1]: sublane starts are roll-only on TPU
    rolled = pltpu.roll(zfull, zfull.shape[0] - 1, 0)
    extra = k_lanes - row_lanes
    xt = jnp.concatenate([zfull[:tile_rows],
                          rolled[:tile_rows, :extra]], axis=1)  # [TR, K]
    yr_ref[:] = jnp.dot(xt, rr_ref[:], precision=precision,
                        preferred_element_type=jnp.float32)
    yi_ref[:] = jnp.dot(xt, ri_ref[:], precision=precision,
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "decim", "tpad", "tile_rows", "precision", "interpret"))
def _run(zi: jax.Array, rr: jax.Array, ri: jax.Array, *, decim: int,
         tpad: int, tile_rows: int, precision: str, interpret: bool):
    a_rows = zi.shape[0] - HALO_ROWS
    row_lanes = zi.shape[1]
    k_lanes = rr.shape[0]
    grid = a_rows // tile_rows
    # Mosaic's dot lowering accepts DEFAULT and HIGHEST only (HIGH
    # raises NotImplementedError on real TPU); 'high' therefore maps to
    # the full f32-quality decomposition.
    prec = dict(default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGHEST,
                highest=jax.lax.Precision.HIGHEST)[precision]
    kern = functools.partial(_kernel, tile_rows=tile_rows, k_lanes=k_lanes,
                             row_lanes=row_lanes, precision=prec)
    yr, yi = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, row_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HALO_ROWS, row_lanes),
                         lambda i: ((i + 1) * (tile_rows // HALO_ROWS), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_lanes, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_lanes, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((a_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((a_rows, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(zi, zi, rr, ri)
    return yr, yi


def supported(n_new: int, decim: int) -> bool:
    """True if the fused kernel handles this (block size, decim) shape."""
    if n_new % decim:
        return False
    n_out = n_new // decim
    return n_out % LANES == 0 and (n_out // LANES) % 8 == 0


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
    a_rows = n_out // LANES
    row_samples = decim * LANES
    row_lanes = 2 * row_samples
    k_lanes = _round_up(2 * (decim * (LANES - 1) + tpad), LANES)
    assert k_lanes <= 2 * row_lanes, "tap span exceeds one halo row"

    g = rotated_taps(jnp.asarray(h_rev_pad, jnp.float32), lo_inc)
    rr, ri = band_matrices(g, decim, k_lanes)

    # frame -> interleaved row matrix [(A+HALO_ROWS), 2*RW] (bitcast +
    # pad + reshape). HALO_ROWS trailing zero rows keep the 8-row halo
    # blocks fully in bounds on every grid step.
    need = (a_rows + HALO_ROWS) * row_samples
    pad = need - frame.shape[0]
    fc = frame.astype(jnp.complex64)
    if pad > 0:
        fc = jnp.concatenate([fc, jnp.zeros((pad,), jnp.complex64)])
    zi = fc.view(jnp.float32)  # [2*need] interleaved re/im (bitcast view)
    zi = zi.reshape(a_rows + HALO_ROWS, row_lanes)

    tile_rows = min(a_rows, 128)
    while a_rows % tile_rows or tile_rows % HALO_ROWS:
        tile_rows //= 2
    yr, yi = _run(zi, rr, ri, decim=decim, tpad=tpad, tile_rows=tile_rows,
                  precision=precision, interpret=interpret)
    return jax.lax.complex(yr.reshape(-1), yi.reshape(-1))


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
