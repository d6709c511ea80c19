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

Formulation (TPU-first; v2 — the r3 "banded" kernel widened K ~15x and
measured 18x slower than XLA, so it was replaced by this design):

* LO folded into the taps (the rotated-taps identity of
  ``ops.fir.xlating_fir_decimate_frame``): complex taps
  ``g[t] = h_rev[t] * exp(j*2*pi*(t - (tpad-1))*lo_inc / 2^32)``; the
  output-side rotation ``exp(j*beta(k))`` is NOT applied here — the
  caller either applies it (generic channelizer) or cancels it into the
  FM discriminator's constant phase offset (WBFM chain; see
  :func:`grbaz_tpu.models.wbfm` fused path). No full-rate sin/cos.

* Polyphase partial products as ONE interleaved matmul. The complex64
  frame bitcasts to f32 pairs and reshapes to the polyphase row matrix
  ``Z[j, 2p+parity]`` (row j = samples j*D..j*D+D-1 as re,im pairs — a
  free layout op). Against the interleaved tap matrix

      T[2p,   2m] =  re g[mD+p]     T[2p,   2m+1] =  im g[mD+p]
      T[2p+1, 2m] = -im g[mD+p]     T[2p+1, 2m+1] =  re g[mD+p]

  ``Q = Z @ T`` gives ``Q[j, 2m] = Re partial_m(j)``,
  ``Q[j, 2m+1] = Im partial_m(j)`` where
  ``partial_m(j) = sum_p g[mD+p] x[jD+p]``, and the output is the band
  sum ``y[k] = sum_m partial_m(k+m)``.

* Band sum in VMEM via masked log-rolls: column pair m must shift up by
  m rows. For each bit b of m, roll the whole Q tile up by b and select
  the rolled value on lanes whose m has bit b set (a lane-iota mask) —
  5 full-lane-width rolls+selects instead of n_phases lane-starved
  column slices. A final tiny matmul against the 0/1 selection matrix
  ``S[2m+s, s] = 1`` sums the bands into ``y[k] = (re, im)``.

* Grid walks row tiles; the next tile's first HALO rows are the same
  array through a second BlockSpec, so partials never leave VMEM.

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

# Halo rows appended to each tile: covers the band sum's maximum
# up-shift (n_phases-1 <= 31) and keeps tile boundaries multiple-of-8.
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


def interleaved_tap_matrix(g: jax.Array, decim: int,
                           n_phases_pad: int) -> jax.Array:
    """[2*decim, 2*n_phases_pad] interleaved polyphase tap matrix T."""
    tpad = g.shape[0]
    gr = g.real.astype(jnp.float32)
    gi = g.imag.astype(jnp.float32)
    rows = jnp.arange(2 * decim, dtype=jnp.int32)[:, None]
    cols = jnp.arange(2 * n_phases_pad, dtype=jnp.int32)[None, :]
    p = rows // 2
    in_par = rows % 2
    m = cols // 2
    out_par = cols % 2
    t = m * decim + p
    valid = t < tpad
    tc = jnp.clip(t, 0, tpad - 1)
    re_t, im_t = gr[tc], gi[tc]
    # (in_par, out_par): (0,0)=re, (1,0)=-im, (0,1)=im, (1,1)=re
    v = jnp.where(out_par == 0,
                  jnp.where(in_par == 0, re_t, -im_t),
                  jnp.where(in_par == 0, im_t, re_t))
    return jnp.where(valid, v, 0.0)


def _kernel(z_ref, halo_ref, t_ref, s_ref, y_ref, *, tile_rows: int,
            n_phases_pad: int, precision):
    z = jnp.concatenate([z_ref[:], halo_ref[:]], axis=0)  # [TR+HALO, 2D]
    q = jnp.dot(z, t_ref[:], precision=precision,
                preferred_element_type=jnp.float32)  # [TR+HALO, 2Mp]
    # band alignment: column pair m shifts up by m rows, done as masked
    # log-rolls (shift-by-b on the whole tile, select on lanes with bit
    # b of m set). No wraparound contamination: the largest total shift
    # is n_phases_pad-1 < HALO and only rows [0, TR) are read out.
    n_rows = q.shape[0]
    lane_m = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) // 2
    b = 1
    while b < n_phases_pad:
        rolled = pltpu.roll(q, n_rows - b, 0)  # rolled[r] = q[r+b]
        q = jnp.where((lane_m & b) != 0, rolled, q)
        b <<= 1
    y_ref[:] = jnp.dot(q[:tile_rows], s_ref[:], precision=precision,
                       preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile_rows", "n_phases_pad", "precision", "interpret"))
def _run(zi: jax.Array, t_mat: jax.Array, s_mat: jax.Array, *,
         tile_rows: int, n_phases_pad: int, precision: str,
         interpret: bool):
    a_rows = zi.shape[0] - HALO
    two_d = zi.shape[1]
    grid = a_rows // tile_rows
    # Mosaic's dot lowering accepts DEFAULT and HIGHEST only (HIGH
    # raises NotImplementedError on real TPU); 'high' therefore maps to
    # the full f32-quality decomposition.
    prec = dict(default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGHEST,
                highest=jax.lax.Precision.HIGHEST)[precision]
    kern = functools.partial(_kernel, tile_rows=tile_rows,
                             n_phases_pad=n_phases_pad, precision=prec)
    y = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, two_d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HALO, two_d),
                         lambda i: ((i + 1) * (tile_rows // HALO), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(t_mat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s_mat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_rows, 2), jnp.float32),
        interpret=interpret,
    )(zi, zi, t_mat, s_mat)
    return y


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(n_new: int, decim: int) -> bool:
    """True if the fused kernel handles this (block size, decim) shape."""
    if decim < 2 or 2 * decim > 128 or n_new % decim:
        return False
    n_out = n_new // decim
    return n_out % (8 * HALO) == 0


def _pick_tile_rows(n_out: int) -> int:
    tr = min(n_out, 4096)
    while n_out % tr or tr % HALO:
        tr //= 2
    return max(tr, HALO)


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
    assert n_phases_pad <= HALO, "tap span exceeds the halo budget"

    g = rotated_taps(jnp.asarray(h_rev_pad, jnp.float32), lo_inc)
    t_mat = interleaved_tap_matrix(g, decim, n_phases_pad)
    # selection matrix: sum band columns into (re, im)
    cols = np.arange(2 * n_phases_pad)
    s_np = np.zeros((2 * n_phases_pad, 2), np.float32)
    s_np[cols, cols % 2] = 1.0
    s_mat = jnp.asarray(s_np)

    # frame -> interleaved polyphase rows [(n_out + HALO), 2*decim]
    # (bitcast + pad + reshape, all layout-free). The band sum reads
    # rows up to n_out-1 + n_phases-1; rows beyond the frame are zero.
    need = (n_out + HALO) * decim
    pad = need - frame.shape[0]
    fc = frame.astype(jnp.complex64)
    if pad > 0:
        fc = jnp.concatenate([fc, jnp.zeros((pad,), jnp.complex64)])
    zi = fc.view(jnp.float32).reshape(n_out + HALO, 2 * decim)

    tile_rows = _pick_tile_rows(n_out)
    y = _run(zi, t_mat, s_mat, tile_rows=tile_rows,
             n_phases_pad=n_phases_pad, precision=precision,
             interpret=interpret)
    # [n_out, 2] f32 (re, im) -> complex64 via the interleaved bitcast
    return y[:n_out].reshape(-1).view(jnp.complex64)


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
