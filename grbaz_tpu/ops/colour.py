"""Colouriser: float vectors -> RGB pixel bytes via a gradient LUT.

Capability parity with ``baz_colouriser``
(/root/reference/lib/baz_colouriser.cc:78-130), which maps float values
through an 18.5 kB baked gradient table for waterfall rendering. Here
the gradient is *generated* (classic thermal ramp: black -> blue ->
cyan -> green -> yellow -> red -> white) rather than baked, and the
mapping is a vectorized LUT gather.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream


def thermal_gradient(n: int = 256) -> np.ndarray:
    """[n, 3] uint8 thermal gradient."""
    stops = np.array([
        [0, 0, 0], [0, 0, 160], [0, 160, 255], [0, 255, 64],
        [255, 255, 0], [255, 64, 0], [255, 255, 255]], np.float64)
    pos = np.linspace(0.0, 1.0, len(stops))
    t = np.linspace(0.0, 1.0, n)
    rgb = np.stack([np.interp(t, pos, stops[:, c]) for c in range(3)], axis=1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class Colouriser(Block):
    """Map float samples in [vmin, vmax] to RGB bytes (3x rate).

    Output is interleaved R,G,B uint8 — the raster feed for waterfall /
    raster sinks (the role of colouriser + sdl_sink in the reference).
    ``vmin``/``vmax`` are runtime params (display range control).
    """

    def __init__(self, vmin: float = -100.0, vmax: float = 0.0,
                 lut: np.ndarray | None = None, name=None):
        super().__init__(name)
        self.lut = np.asarray(lut if lut is not None else thermal_gradient(),
                              np.uint8)
        self.vmin0, self.vmax0 = float(vmin), float(vmax)

    def init_params(self):
        return dict(vmin=np.float32(self.vmin0), vmax=np.float32(self.vmax0))

    def apply(self, state, params, x: Stream):
        lo, hi = params["vmin"], params["vmax"]
        t = (x.data.astype(jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-9)
        idx = jnp.clip((t * (len(self.lut) - 1)).astype(jnp.int32),
                       0, len(self.lut) - 1)
        rgb = jnp.asarray(self.lut)[idx]            # [..., 3]
        flat = rgb.reshape(x.data.shape[:-1] + (-1,)) if x.data.ndim > 1 \
            else rgb.reshape(-1)
        out = x.like(flat.astype(jnp.uint8), count=x.count * 3
                     if x.data.ndim == 1 else x.count, rate_scale=3.0)
        return state, (out,)
