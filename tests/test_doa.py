"""MUSIC DoA: recover known source angles from a simulated ULA."""

import numpy as np
import jax.numpy as jnp

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.doa import MusicDOA, music_spectrum, ula_steering_vectors


def simulate_ula(m, angles_deg, navg, snr_db=20, seed=0):
    rng = np.random.default_rng(seed)
    a = ula_steering_vectors(m, 360)
    idx = [int(round(d / 180.0 * 360)) % 360 for d in angles_deg]
    x = np.zeros((navg, m), np.complex64)
    for i in idx:
        s = (rng.standard_normal(navg) + 1j * rng.standard_normal(navg))
        x += np.outer(s, a[i]).astype(np.complex64)
    noise = 10 ** (-snr_db / 20.0)
    x += noise * (rng.standard_normal((navg, m))
                  + 1j * rng.standard_normal((navg, m))).astype(np.complex64)
    return x.astype(np.complex64), idx


def test_music_two_sources():
    m, navg = 8, 256
    x, idx = simulate_ula(m, [60.0, 120.0], navg)
    steer = jnp.asarray(ula_steering_vectors(m, 360))
    spec, evals = music_spectrum(jnp.asarray(x), steer, n_signals=2)
    spec = np.asarray(spec)
    # the two largest spectrum peaks must be at the true angles (+-2 bins)
    found = np.argsort(spec)[-10:]
    hits = 0
    for i in idx:
        if np.min(np.abs(((found - i + 180) % 360) - 180)) <= 2:
            hits += 1
    assert hits == 2, (sorted(found), idx)


def test_music_block():
    m, navg, frames = 4, 128, 3
    x, idx = simulate_ula(m, [90.0], navg * frames)
    data = x.reshape(frames, navg * m)
    blk = MusicDOA(n_antennas=m, n_signals=1, navg=navg)
    state, (spec, doas) = blk.apply(blk.init_state(), blk.init_params(),
                                    Stream.full(jnp.asarray(data)))
    d = np.asarray(doas.data)
    for f in range(frames):
        assert min(abs(int(d[f, 0]) - idx[0]), 360 - abs(int(d[f, 0]) - idx[0])) <= 3


def test_subspace_matches_eigh():
    """The matmul-only subspace method must agree with the eigh method."""
    import jax
    m, navg = 8, 512
    x, idx = simulate_ula(m, [45.0, 135.0], navg, snr_db=15)
    steer = jnp.asarray(ula_steering_vectors(m, 360))
    s1, _ = music_spectrum(jnp.asarray(x), steer, 2, method="eigh")
    s2, _ = music_spectrum(jnp.asarray(x), steer, 2, method="subspace")
    s1, s2 = np.asarray(s1), np.asarray(s2)
    # same peak locations
    assert abs(int(np.argmax(s1)) - int(np.argmax(s2))) <= 1
    # spectra correlate strongly in log domain
    l1, l2 = np.log10(s1), np.log10(s2)
    c = np.corrcoef(l1, l2)[0, 1]
    assert c > 0.99, c


def test_sharded_music_parity_and_peaks():
    """8-device sharded MUSIC == serial MUSIC; peaks at the true DoAs."""
    import jax
    from jax.sharding import Mesh
    from grbaz_tpu.ops.doa import music_spectrum, ula_steering_vectors
    from grbaz_tpu.parallel.doa import (sharded_music_spectrum,
                                        simulate_snapshots)

    m, navg, n_sig = 8, 256, 2
    angles = [60.0, 110.0]
    x = simulate_snapshots(m, angles, navg, snr_db=20.0, seed=3)
    steering = ula_steering_vectors(m, n_angles=360)

    serial, _ = music_spectrum(jnp.asarray(x), jnp.asarray(steering), n_sig)
    serial = np.asarray(serial)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dev",))
    sharded = np.asarray(sharded_music_spectrum(
        jnp.asarray(x), jnp.asarray(steering), n_sig, mesh))

    assert sharded.shape == serial.shape
    # parity: the reciprocal amplifies f32 accumulation-order effects at
    # the (near-singular) peaks, so compare in dB
    db_err = np.max(np.abs(10 * np.log10(sharded / serial)))
    assert db_err < 0.2, db_err
    # and the physics: peaks at the true angles (0.5 deg grid)
    top2 = np.sort(np.argsort(sharded)[-8:] * 0.5)
    found = [np.min(np.abs(top2 - a)) for a in angles]
    assert max(found) < 3.0, (top2, angles)


def test_music_close_sources_3deg():
    """Two sources 3 degrees apart (clustered eigenvalues — the
    underconvergence case of VERDICT r2 weak #5): the subspace method
    must resolve both and agree with numpy.linalg.eigh."""
    import jax
    m, navg = 12, 2048
    angles = [88.5, 91.5]
    x, idx = simulate_ula(m, angles, navg, snr_db=25, seed=3)
    steer = jnp.asarray(ula_steering_vectors(m, 720))
    idx720 = [int(round(d / 180.0 * 720)) % 720 for d in angles]

    # numpy reference: eigh noise-subspace spectrum in f64
    xn = np.asarray(x, np.complex128)
    r = xn.conj().T @ xn / navg
    w, v = np.linalg.eigh(r)
    g = v[:, : m - 2]
    a = np.asarray(ula_steering_vectors(m, 720), np.complex128)
    ref = 1.0 / np.maximum(np.sum(np.abs(a.conj() @ g) ** 2, axis=1), 1e-30)

    spec, _ = music_spectrum(jnp.asarray(x), steer, 2, method="subspace")
    spec = np.asarray(spec)

    def peaks2(s):
        left, right = np.roll(s, 1), np.roll(s, -1)
        pk = np.where((s >= left) & (s >= right), s, -np.inf)
        return np.sort(np.argsort(pk)[-2:])

    p_ref = peaks2(ref)
    p_got = peaks2(spec)
    # both find the true pair (within 2 bins of 0.25 deg each)
    for want, got in zip(sorted(idx720), p_got):
        assert abs(int(got) - want) <= 2, (p_got, idx720)
    np.testing.assert_array_equal(p_got, p_ref)
