"""MUSIC direction finding — batched covariance + EVD + pseudospectrum.

Tensor reformulation of ``baz_music_doa``
(/root/reference/lib/baz_music_doa.cc:71-160): per input vector group,

    R = sum_i x_i x_i^H / navg            (M-antenna covariance)
    eigendecompose R (Hermitian)
    G = eigenvectors of the m - n smallest eigenvalues (noise subspace)
    P(theta) = 1 / || G^H a(theta) ||^2   (pseudospectrum over steering
                                           vectors a)
    emit top-n peak angles + the spectrum

and the steering-vector builder mirrors python/music_doa_helper.py
(uniform linear array response). The reference needs Armadillo/LAPACK;
here it is ``jnp.linalg.eigh`` + two matmuls — MXU work, batchable over
time windows.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.block import Block
from grbaz_tpu.core.stream import Stream


def ula_steering_vectors(n_antennas: int, n_angles: int = 360,
                         spacing_wavelengths: float = 0.5) -> np.ndarray:
    """[n_angles, M] ULA array response over [0, pi) broadside angles
    (music_doa_helper equivalent)."""
    theta = np.linspace(0.0, np.pi, n_angles, endpoint=False)
    m = np.arange(n_antennas)
    phase = 2.0 * np.pi * spacing_wavelengths * np.cos(theta)[:, None] * m[None, :]
    return np.exp(1j * phase).astype(np.complex64)


_HI = jax.lax.Precision.HIGHEST  # covariance/EVD math must not drop to bf16


def _orthonormalize(v: jax.Array) -> jax.Array:
    """Modified Gram-Schmidt over the (few, static) columns of v [M, n]."""
    cols = []
    for j in range(v.shape[1]):
        c = v[:, j]
        for q in cols:
            c = c - q * jnp.vdot(q, c)
        norm = jnp.sqrt(jnp.maximum(
            jnp.sum(c.real ** 2 + c.imag ** 2), 1e-30))
        cols.append(c / norm)
    return jnp.stack(cols, axis=1)


def signal_subspace(r: jax.Array, n_signals: int, iters: int = 24,
                    tol: float = 1e-5, max_iters: int = 96) -> jax.Array:
    """Dominant-eigenvector basis of Hermitian r [M, M] via orthogonal
    (subspace) iteration — pure matmul + Gram-Schmidt, no LAPACK custom
    calls. TPU-native: everything maps to the MXU and batches cleanly.

    Convergence guard (LAPACK-``eig_sym`` fidelity without LAPACK,
    reference lib/baz_music_doa.cc:71-160): iteration runs on ``R^2``
    (one extra tiny matmul per step squares the eigenvalue ratios —
    doubling the convergence rate for clustered spectra) inside a
    ``lax.while_loop`` that stops when the subspace residual

        || R2 V - V (V^H R2 V) ||_F  <=  tol * || R2 V ||_F

    falls below ``tol`` or at ``max_iters``. ``iters`` is the floor
    (at least this many iterations always run); closely-spaced
    eigenvalues — e.g. two sources a few degrees apart — thus get the
    extra iterations they need instead of silently underconverging.
    """
    m = r.shape[0]
    # generic-position init: first n columns of the DFT matrix
    k = np.arange(m)
    f = np.exp(2j * np.pi * np.outer(k, np.arange(n_signals)) / m)
    v0 = jnp.asarray(f.astype(np.complex64))
    # spectral-ratio acceleration; R is PSD so R^2 keeps the eigenbasis
    r2 = jax.lax.dot(r, r, precision=_HI)

    def residual(v):
        bv = jax.lax.dot(r2, v, precision=_HI)
        h = jax.lax.dot(v.conj().T, bv, precision=_HI)   # [n, n]
        res = bv - jax.lax.dot(v, h, precision=_HI)
        num = jnp.sum(res.real ** 2 + res.imag ** 2)
        den = jnp.maximum(jnp.sum(bv.real ** 2 + bv.imag ** 2), 1e-30)
        return num / den  # squared relative residual

    def cond(carry):
        v, i = carry
        return (i < iters) | ((i < max_iters)
                              & (residual(v) > jnp.float32(tol) ** 2))

    def body(carry):
        v, i = carry
        v = _orthonormalize(jax.lax.dot(r2, v, precision=_HI))
        return v, i + 1

    v, _ = jax.lax.while_loop(cond, body, (v0, jnp.int32(0)))
    return v


def music_spectrum(x: jax.Array, steering: jax.Array, n_signals: int,
                   method: str = "subspace"):
    """One MUSIC solve.

    x: [navg, M] snapshot matrix; steering: [A, M].
    Returns (spectrum [A] float32, aux) where aux is the eigenvalue
    vector for method='eigh' or the signal-subspace basis for
    method='subspace' (the default — see :func:`signal_subspace`).

    The pseudospectrum uses the identity ||G^H a||^2 = ||a||^2 -
    ||U_s^H a||^2 (noise projector = I - signal projector), so only the
    n_signals-dimensional signal basis is ever materialized.
    """
    navg = x.shape[0]
    r = jax.lax.dot(x.conj().T, x, precision=_HI) / navg  # [M, M] Hermitian
    if method == "eigh":
        evals, evecs = jnp.linalg.eigh(r)
        m = x.shape[1]
        g = evecs[:, : m - n_signals]                # noise subspace [M, K]
        proj = jax.lax.dot(steering.conj(), g, precision=_HI)
        denom = jnp.sum(proj.real ** 2 + proj.imag ** 2, axis=1)
        aux = evals
    else:
        us = signal_subspace(r, n_signals)           # [M, n]
        a2 = jnp.sum(steering.real ** 2 + steering.imag ** 2, axis=1)
        proj = jax.lax.dot(steering.conj(), us, precision=_HI)  # [A, n]
        denom = a2 - jnp.sum(proj.real ** 2 + proj.imag ** 2, axis=1)
        aux = us
    spec = 1.0 / jnp.maximum(denom, 1e-20)
    return spec.astype(jnp.float32), aux


def top_n_peaks(spec: jax.Array, n: int):
    """Indices+values of the n largest local maxima of a 1-D spectrum."""
    left = jnp.roll(spec, 1)
    right = jnp.roll(spec, -1)
    is_peak = (spec >= left) & (spec >= right)
    masked = jnp.where(is_peak, spec, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, n)
    return idx, vals


class MusicDOA(Block):
    """Streaming MUSIC block.

    Input: frames [n_frames, navg * M] (the reference's reshaped
    M-channel sample vectors, swig/baz_swig.i:560-573). Outputs:
    (pseudospectrum [n_frames, A], doas [n_frames, n_signals] int32
    angle indices).
    """

    n_out = 2

    def __init__(self, n_antennas: int, n_signals: int, navg: int,
                 steering: np.ndarray | None = None, n_angles: int = 360,
                 method: str = "subspace", name=None):
        super().__init__(name)
        self.method = method
        if n_signals >= n_antennas:
            raise ValueError("need n_signals < n_antennas")
        self.m = int(n_antennas)
        self.n = int(n_signals)
        self.navg = int(navg)
        self.steering = np.asarray(
            steering if steering is not None
            else ula_steering_vectors(n_antennas, n_angles), np.complex64)

    def apply(self, state, params, x: Stream):
        frames = x.data.reshape(x.data.shape[0], self.navg, self.m)
        steer = jnp.asarray(self.steering)

        def one(fr):
            spec, _ = music_spectrum(fr, steer, self.n, method=self.method)
            idx, _ = top_n_peaks(spec, self.n)
            return spec, idx

        specs, doas = jax.vmap(one)(frames)
        return state, (x.like(specs, count=x.count),
                       x.like(doas, count=x.count))
