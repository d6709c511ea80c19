"""Pallas TPU kernel: tiled decimating FIR over a frame.

Semantics match :func:`grbaz_tpu.ops.fir.fir_decimate_frame` exactly:
``y[k] = sum_t h_rev_pad[t] * frame[k*decim + t]`` with ``tpad-1``
leading history samples in the frame. Complex frames run as two planar
(real/imag) passes.

Formulation: the frame is viewed as its polyphase matrix ``Z[j, p] =
frame[j*decim + p]`` (a host-side reshape). With ``M = tpad/decim`` tap
phases,

    y[k] = sum_{m,p} h[m*decim+p] * Z[k+m, p] = ( concat_m Z[k+m, :] ) . h

Each grid step receives its output tile's Z rows as a pipelined VMEM
block plus a separate halo block (the same array through a second
BlockSpec — tiles overlap by M rows), assembles the ``[T, tpad]``
window matrix *in VMEM* via rolls (Mosaic cannot slice unaligned
sublane starts), and contracts on the MXU at HIGHEST precision.

Measured on TPU v5e (155 taps, decim 8, 1M-sample complex frame):
~0.9 Gsamp/s — on par with the polyphase-matmul XLA path in
:mod:`grbaz_tpu.ops.fir` (which is the production default; this kernel
is the template for fusions XLA cannot express, e.g. FIR + nonlinear
post-ops in one VMEM pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n_out: int, cap: int = 1024) -> int:
    """Largest divisor of n_out that is <= cap and a multiple of 8
    (sublane alignment); falls back to n_out when it's small."""
    if n_out <= cap:
        return n_out
    best = 1
    for t in range(8, cap + 1, 8):
        if n_out % t == 0:
            best = t
    return best if best > 1 else n_out


def _fir_kernel(z_main_ref, z_halo_ref, taps_ref, out_ref, *,
                tile_out: int, n_phases: int):
    # rows this tile needs: [i*tile_out, i*tile_out + tile_out + n_phases);
    # delivered as two pipelined VMEM blocks (main tile + halo block)
    zfull = jnp.concatenate([z_main_ref[:], z_halo_ref[:]], axis=0)
    # W[k, m*decim + p] = Z[k+m, p]; build by rolling rows up by m and
    # taking the aligned [0:tile_out) slice (static unaligned sublane
    # starts are not sliceable on TPU; roll is)
    total = zfull.shape[0]
    parts = []
    for m in range(n_phases):
        # roll must be non-negative: total - m == roll by -m (mod total)
        shifted = pltpu.roll(zfull, total - m, 0) if m else zfull
        parts.append(shifted[0:tile_out, :])
    windows = jnp.concatenate(parts, axis=1)  # [tile_out, tpad]
    out_ref[:] = jnp.dot(windows, taps_ref[:],
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("decim", "tile_out", "interpret"))
def _fir_decimate_planar(frame: jax.Array, h_rev_pad: jax.Array,
                         decim: int, tile_out: int,
                         interpret: bool = False) -> jax.Array:
    tpad = h_rev_pad.shape[0]
    n_phases = tpad // decim
    n_out = (frame.shape[0] - (tpad - 1)) // decim
    grid = n_out // tile_out
    # polyphase view Z[j, p] = frame[j*decim + p]. The halo block (the
    # next n_phases rows after each tile) is the same array delivered
    # through a second BlockSpec whose block size divides tile_out, so
    # padding rounds n_phases up to a divisor-friendly halo size.
    halo = tile_out
    while halo > n_phases and halo % 2 == 0 and halo // 2 >= n_phases:
        halo //= 2
    n_rows = (grid + 1) * tile_out  # main tiles + one extra for halos
    pad = n_rows * decim - frame.shape[0]
    if pad > 0:
        frame = jnp.concatenate([frame, jnp.zeros(pad, frame.dtype)])
    z = frame[: n_rows * decim].reshape(n_rows, decim)
    taps = h_rev_pad.reshape(tpad, 1)
    kern = functools.partial(_fir_kernel, tile_out=tile_out,
                             n_phases=n_phases)
    hb = tile_out // halo  # halo block index stride within a tile
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_out, decim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((halo, decim), lambda i: ((i + 1) * hb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps resident
        ],
        out_specs=pl.BlockSpec((tile_out, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, 1), jnp.float32),
        interpret=interpret,
    )(z, z, taps)
    return out[:, 0]


def fir_decimate_frame_pallas(frame: jax.Array, h_rev_pad: jax.Array,
                              decim: int, tile_out: int | None = None,
                              interpret: bool = False) -> jax.Array:
    """Drop-in Pallas path for ``ops.fir.fir_decimate_frame``.

    ``frame`` is real f32 or complex64 with ``tpad-1`` leading history;
    returns ``(len(frame) - tpad + 1) // decim`` outputs. ``interpret``
    runs the kernel in the Pallas interpreter (CPU testing).
    """
    h = jnp.asarray(h_rev_pad, jnp.float32)
    tpad = h.shape[0]
    assert tpad % decim == 0, "taps must be padded to a multiple of decim"
    n_new = frame.shape[0] - (tpad - 1)
    assert n_new % decim == 0, "block size must be a multiple of decim"
    n_out = n_new // decim
    if tile_out is None:
        tile_out = _pick_tile(n_out)
    assert n_out % tile_out == 0
    if jnp.iscomplexobj(frame):
        yr = _fir_decimate_planar(frame.real.astype(jnp.float32), h, decim,
                                  tile_out, interpret)
        yi = _fir_decimate_planar(frame.imag.astype(jnp.float32), h, decim,
                                  tile_out, interpret)
        return jax.lax.complex(yr, yi)
    return _fir_decimate_planar(frame.astype(jnp.float32), h, decim,
                                tile_out, interpret)
