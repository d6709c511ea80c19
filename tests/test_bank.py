"""Sharded WBFM bank on an 8-device CPU mesh vs the serial single chain.

The north-star check: time-sharded execution with halo exchange must be
*bit-consistent* (here: float-exact within reordering tolerance) with
the serial single-device chain.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.parallel.wbfm_bank import BankConfig, ShardedWBFMBank
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
from tests.conftest import snr_db


def make_bank(pc, pt, channels=4, block=8192 * 2):
    devs = np.array(jax.devices()[:pc * pt]).reshape(pc, pt)
    mesh = Mesh(devs, ("chan", "time"))
    cfg = BankConfig(channels=channels, block_size=block,
                     sample_rate=1.024e6, decim=8, audio_rate=48e3,
                     channel_width=100e3, transition=50e3)
    return ShardedWBFMBank(cfg, mesh), cfg


def synth(cfg, freqs, nblocks, seed=0):
    rng = np.random.default_rng(seed)
    n = cfg.block_size * nblocks
    t = np.arange(n) / cfg.sample_rate
    chans = []
    for f in freqs:
        msg = np.sin(2 * np.pi * 700.0 * t)
        phase = 2 * np.pi * np.cumsum(50e3 * msg) / cfg.sample_rate
        x = np.exp(1j * (phase + 2 * np.pi * f * t))
        x += 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        chans.append(x.astype(np.complex64))
    return np.stack(chans)


def run_bank(bank, cfg, x_all, freqs):
    state = jax.device_put(bank.init_state(), bank.state_shardings())
    params = bank.init_params(freqs)
    outs = []
    nblocks = x_all.shape[1] // cfg.block_size
    for b in range(nblocks):
        x = jax.device_put(
            np.ascontiguousarray(
                x_all[:, b * cfg.block_size:(b + 1) * cfg.block_size]),
            bank.input_sharding())
        state, (audio, counts) = bank.step(state, params, x)
        outs.append(bank.compact_audio(audio, counts))
    return [np.concatenate([o[i] for o in outs]) for i in range(cfg.channels)]


def serial_reference(cfg, x_ch, freq):
    """Single-channel serial chain with the same parameters (no deemph —
    the bank stops at resampled audio)."""
    from grbaz_tpu.ops.fir import FreqXlatingFIRDecimator, low_pass_taps
    from grbaz_tpu.ops.demod import QuadratureDemod
    from grbaz_tpu.ops.resampler import FractionalResampler

    taps = low_pass_taps(1.0, cfg.sample_rate,
                         cfg.channel_width / 2 + cfg.transition / 2,
                         cfg.transition)
    chan = FreqXlatingFIRDecimator(taps, cfg.decim, freq, cfg.sample_rate)
    dem = QuadratureDemod(cfg.quad_rate / (2 * np.pi * cfg.max_deviation))
    rs = FractionalResampler(cfg.block_size // cfg.decim, cfg.ratio,
                             dtype=jnp.float32)
    s1, p1 = chan.init_state(), chan.init_params()
    s2, p2 = dem.init_state(), dem.init_params()
    s3, p3 = rs.init_state(), rs.init_params()
    outs = []
    nblocks = len(x_ch) // cfg.block_size
    for b in range(nblocks):
        blk = Stream.full(jnp.asarray(
            x_ch[b * cfg.block_size:(b + 1) * cfg.block_size]))
        s1, (y1,) = chan.apply(s1, p1, blk)
        s2, (y2,) = dem.apply(s2, p2, y1)
        s3, (y3,) = rs.apply(s3, p3, y2)
        outs.append(np.asarray(y3.data[:int(y3.count)]))
    return np.concatenate(outs)


def test_bank_matches_serial_chain():
    channels = 4
    bank, cfg = make_bank(pc=4, pt=2, channels=channels)
    freqs = np.array([-300e3, -100e3, 100e3, 300e3])
    x_all = synth(cfg, freqs, nblocks=3)
    bank_out = run_bank(bank, cfg, x_all, freqs)
    for i in range(channels):
        ref = serial_reference(cfg, x_all[i], freqs[i])
        n = min(len(ref), len(bank_out[i]))
        assert n > 1000
        s = snr_db(ref[:n], bank_out[i][:n])
        assert s > 80, f"channel {i}: {s:.1f} dB vs serial"


def test_bank_mesh_shape_invariance():
    """Same data, different mesh layouts -> same audio."""
    channels = 4
    freqs = np.array([-250e3, 0.0, 120e3, 350e3])
    outs = []
    for pc, pt in [(1, 1), (2, 4), (4, 2)]:
        bank, cfg = make_bank(pc=pc, pt=pt, channels=channels)
        x_all = synth(cfg, freqs, nblocks=2)
        outs.append(run_bank(bank, cfg, x_all, freqs))
    for i in range(channels):
        n = min(len(outs[0][i]), len(outs[1][i]), len(outs[2][i]))
        s1 = snr_db(outs[0][i][:n], outs[1][i][:n])
        s2 = snr_db(outs[0][i][:n], outs[2][i][:n])
        assert s1 > 90 and s2 > 90, f"ch{i}: {s1:.1f}/{s2:.1f} dB"


def test_bank_bit_exact_across_time_shardings():
    """The north-star invariant (BASELINE.md): time-shard boundaries are
    BIT-consistent with a serial run — audio from pt=1/2/4 meshes is
    byte-identical (the FIR's head/body term grouping is independent of
    where shard boundaries fall)."""
    import jax
    from jax.sharding import Mesh
    from grbaz_tpu.parallel.wbfm_bank import BankConfig, ShardedWBFMBank

    def run(pt):
        devs = np.array(jax.devices()[:2 * pt]).reshape(2, pt)
        mesh = Mesh(devs, ("chan", "time"))
        cfg = BankConfig(channels=2, block_size=8192, sample_rate=1.024e6,
                         decim=8, audio_rate=16e3, channel_width=100e3,
                         transition=100e3)
        bank = ShardedWBFMBank(cfg, mesh)
        rng = np.random.default_rng(7)
        x = (rng.standard_normal((2, cfg.block_size))
             + 1j * rng.standard_normal((2, cfg.block_size))) \
            .astype(np.complex64)
        state = jax.device_put(bank.init_state(), bank.state_shardings())
        params = bank.init_params([-100e3, 100e3])
        xg = jax.device_put(x, bank.input_sharding())
        state, (audio, counts) = bank.step(state, params, xg)
        return bank.compact_audio(np.asarray(audio), np.asarray(counts))

    a1, a2, a4 = run(1), run(2), run(4)
    for c in range(2):
        np.testing.assert_array_equal(a1[c], a2[c],
                                      err_msg=f"ch{c}: pt=2 diverged")
        np.testing.assert_array_equal(a1[c], a4[c],
                                      err_msg=f"ch{c}: pt=4 diverged")
