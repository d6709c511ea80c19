"""Multi-chip MUSIC direction finding.

The SURVEY §2.4 mapping for the reference's M-antenna DoA
(lib/baz_music_doa.cc): *"antenna axis sharding for covariance
accumulation with a psum"*. Concretely the snapshot (time) axis is the
large one, so the sharding here is:

* **snapshots sharded** across the mesh: each device forms the partial
  covariance ``X_l^H X_l`` of its snapshot slice — one local MXU matmul
  — and a single ``psum`` over ICI yields the full ``R`` everywhere
  (covariance accumulation IS the collective);
* the small EVD/subspace iteration is replicated (M x M, trivial);
* the **angle grid is sharded** for the pseudospectrum scan: each
  device scores its slice of steering vectors, so the scan (the other
  large axis) also scales linearly.

Bit-consistency: psum of partials reorders the snapshot sum; parity
with the serial solve is at f32 accumulation tolerance (HIGHEST
precision matmuls), verified in tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grbaz_tpu.ops.doa import signal_subspace

_HI = jax.lax.Precision.HIGHEST


def sharded_music_spectrum(x, steering, n_signals: int, mesh: Mesh,
                           axis: str = "dev"):
    """MUSIC pseudospectrum over an n-device mesh.

    x: [navg, M] snapshots (navg divisible by the mesh axis size);
    steering: [A, M] (A divisible likewise). Returns the full spectrum
    [A] (device-sharded along the angle axis).
    """
    navg = x.shape[0]

    def local(xl, sl):
        r_part = jax.lax.dot(xl.conj().T, xl, precision=_HI)
        r = jax.lax.psum(r_part, axis) / navg         # full R, all devices
        us = signal_subspace(r, n_signals)            # replicated solve
        a2 = jnp.sum(sl.real ** 2 + sl.imag ** 2, axis=1)
        proj = jax.lax.dot(sl.conj(), us, precision=_HI)
        denom = a2 - jnp.sum(proj.real ** 2 + proj.imag ** 2, axis=1)
        return (1.0 / jnp.maximum(denom, 1e-20)).astype(jnp.float32)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis, None), P(axis, None)),
                   out_specs=P(axis))
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    ss = jax.device_put(steering, NamedSharding(mesh, P(axis, None)))
    return jax.jit(fn)(xs, ss)


def simulate_snapshots(n_antennas: int, angles_deg, navg: int,
                       snr_db: float = 20.0, seed: int = 0,
                       spacing_wavelengths: float = 0.5) -> np.ndarray:
    """Test helper: ULA snapshot matrix with sources at ``angles_deg``."""
    rng = np.random.default_rng(seed)
    m = np.arange(n_antennas)
    x = np.zeros((navg, n_antennas), np.complex128)
    for ang in np.atleast_1d(angles_deg):
        # snapshot rows: R = X^H X spans conj(a), so emit conj(a(theta))
        # to match the steering convention of ops.doa
        a = np.exp(-2j * np.pi * spacing_wavelengths
                   * np.cos(np.deg2rad(ang)) * m)
        s = (rng.standard_normal(navg) + 1j * rng.standard_normal(navg))
        x += np.outer(s, a)
    amp = 10.0 ** (-snr_db / 20.0)
    x += amp * (rng.standard_normal(x.shape)
                + 1j * rng.standard_normal(x.shape))
    return x.astype(np.complex64)
