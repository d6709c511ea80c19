"""Dynamic channel bank (runtime add/remove) + checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp

from grbaz_tpu.core.checkpoint import load_state, save_state
from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.parallel.channel_bank import DynamicChannelBank
from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm


def synth_fm_at(fs, freq, n, tone, dev=4e3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * tone * t)
    ph = 2 * np.pi * np.cumsum(dev * msg) / fs
    return np.exp(1j * (ph + 2 * np.pi * freq * t)).astype(np.complex64)


def tone_of(quad_row, rate):
    spec = np.abs(np.fft.rfft(quad_row * np.hanning(len(quad_row))))
    return np.fft.rfftfreq(len(quad_row), 1.0 / rate)[np.argmax(spec[1:]) + 1]


def test_dynamic_bank_add_retune_remove():
    fs, decim, n = 512e3, 8, 1 << 15
    bank = DynamicChannelBank(capacity=4, sample_rate=fs, decim=decim,
                              channel_width=12e3, transition=8e3)
    params = bank.init_params()
    state = bank.init_state()
    jit_step = jax.jit(bank.apply)

    x = (synth_fm_at(fs, -100e3, n, 1000.0, seed=1)
         + synth_fm_at(fs, 150e3, n, 2500.0, seed=2)).astype(np.complex64)
    s = Stream.full(jnp.asarray(x), meta=StreamMeta.start(fs))

    # no channels active: all outputs muted
    state, (quad, act) = jit_step(state, params, s)
    assert np.all(np.asarray(quad.data) == 0)

    # add two channels at runtime (params only; jit cache must not miss)
    slot_a = bank.add_channel(params, -100e3)
    slot_b = bank.add_channel(params, 150e3)
    state, (quad, act) = jit_step(state, params, s)
    q = np.asarray(quad.data)
    rate = fs / decim
    assert abs(tone_of(q[slot_a][500:], rate) - 1000.0) < 30
    assert abs(tone_of(q[slot_b][500:], rate) - 2500.0) < 30

    # retune slot_a onto the other station
    bank.retune(params, slot_a, 150e3)
    state, (quad, _) = jit_step(state, params, s)
    state, (quad, _) = jit_step(state, params, s)  # settle transient
    q = np.asarray(quad.data)
    assert abs(tone_of(q[slot_a][500:], rate) - 2500.0) < 30

    # remove slot_b: its lane mutes
    bank.remove_channel(params, slot_b)
    state, (quad, _) = jit_step(state, params, s)
    q = np.asarray(quad.data)
    assert np.all(q[slot_b] == 0)
    assert bank.channels() == {slot_a: 150e3}


def test_checkpoint_resume_bit_exact(tmp_path):
    cfg = WBFMConfig(block_size=1 << 14)
    fg, _ = build_wbfm(cfg)
    step = jax.jit(fg.build_step())
    params = fg.init_params()

    rng = np.random.default_rng(0)
    blocks = [
        (rng.standard_normal(cfg.block_size)
         + 1j * rng.standard_normal(cfg.block_size)).astype(np.complex64)
        for _ in range(4)]

    def feed(states, xs):
        outs = []
        from grbaz_tpu.core.stream import Stream, StreamMeta
        for x in xs:
            s = Stream.full(jnp.asarray(x), meta=StreamMeta.start(cfg.sample_rate))
            states, o = step(states, params, {"iq": s})
            outs.append(np.asarray(o["audio"].data))
        return states, outs

    # run 2 blocks, checkpoint, run 2 more
    st = fg.init_states()
    st, _ = feed(st, blocks[:2])
    ckpt = tmp_path / "session.npz"
    save_state(str(ckpt), st, params, extra=dict(blocks_done=2))
    _, tail_a = feed(st, blocks[2:])

    # resume from the checkpoint in a fresh context
    st2, params2, extra = load_state(str(ckpt), fg.init_states(),
                                     fg.init_params())
    assert int(extra["blocks_done"]) == 2
    _, tail_b = feed(st2, blocks[2:])
    for a, b in zip(tail_a, tail_b):
        np.testing.assert_array_equal(a, b)  # bit-exact resume


def test_checkpoint_rejects_mismatched_topology(tmp_path):
    cfg = WBFMConfig(block_size=1 << 14)
    fg, _ = build_wbfm(cfg)
    p = tmp_path / "s.npz"
    save_state(str(p), fg.init_states())
    cfg2 = WBFMConfig(block_size=1 << 13)  # different shapes
    fg2, _ = build_wbfm(cfg2)
    import pytest
    with pytest.raises((ValueError, KeyError)):
        load_state(str(p), fg2.init_states())
