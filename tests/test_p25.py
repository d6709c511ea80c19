"""P25 frame sync: dibit-level detection, block boundaries, full chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grbaz_tpu.core.stream import Stream, StreamMeta
from grbaz_tpu.ops.p25 import (FS_DIBITS, P25FrameSync, make_frame)


def _stream(dib, count=None, rate=4800.0):
    dib = np.asarray(dib, np.uint8)
    return Stream(data=jnp.asarray(dib),
                  count=jnp.int32(count if count is not None else len(dib)),
                  meta=StreamMeta.start(rate))


def _events(ev_stream):
    n = int(ev_stream.count)
    rows = np.asarray(ev_stream.data)[:n].astype(np.float64)
    if len(rows):
        from grbaz_tpu.core.stream import decode_i32
        rows[:, 0] = decode_i32(np.asarray(ev_stream.data)[:n, 0])
    return rows


def test_fs_constants():
    # 24 dibits re-assemble to the canonical 48-bit sync word
    word = 0
    for d in FS_DIBITS:
        word = (word << 2) | int(d)
    assert word == 0x5575F5FF77FF


def test_single_frame_detection():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 4, 100).astype(np.uint8)
    frame = make_frame(nac=0x293, duid=0x5, payload_dibits=40, rng=rng)
    dib = np.concatenate([noise, frame, rng.integers(0, 4, 50).astype(np.uint8)])
    blk = P25FrameSync(max_errors=0)
    s, (ev,) = blk.apply(blk.init_state(), blk.init_params(), _stream(dib))
    rows = _events(ev)
    assert len(rows) == 1
    idx, nac, duid, errs = rows[0]
    assert idx == 100 and errs == 0
    assert int(nac) == 0x293 and int(duid) == 0x5


def test_sync_straddling_block_boundary():
    """A sync split across two blocks must be detected exactly once."""
    rng = np.random.default_rng(2)
    frame = make_frame(nac=0xFED, duid=0x7, payload_dibits=10, rng=rng)
    pre = rng.integers(0, 4, 97).astype(np.uint8)
    post = rng.integers(0, 4, 61).astype(np.uint8)
    dib = np.concatenate([pre, frame, post])
    blk = P25FrameSync(max_errors=0)
    # split right through the middle of the sync word
    cut = 97 + 12
    st = blk.init_state()
    prm = blk.init_params()
    st, (ev1,) = blk.apply(st, prm, _stream(dib[:cut]))
    st, (ev2,) = blk.apply(st, prm, _stream(dib[cut:]))
    rows = np.concatenate([_events(ev1), _events(ev2)])
    assert len(rows) == 1
    assert rows[0][0] == 97 and int(rows[0][1]) == 0xFED


def test_error_tolerance():
    rng = np.random.default_rng(3)
    frame = make_frame(nac=0x111, duid=0x3, rng=rng)
    frame[5] ^= 1  # corrupt one sync dibit
    blk0 = P25FrameSync(max_errors=0)
    s, (ev,) = blk0.apply(blk0.init_state(), blk0.init_params(),
                          _stream(frame))
    assert int(ev.count) == 0
    blk1 = P25FrameSync(max_errors=1)
    s, (ev,) = blk1.apply(blk1.init_state(), blk1.init_params(),
                          _stream(frame))
    rows = _events(ev)
    assert len(rows) == 1 and rows[0][3] == 1


def test_multiple_frames_and_counters():
    rng = np.random.default_rng(4)
    gap = rng.integers(0, 4, 30).astype(np.uint8)
    f1 = make_frame(nac=0x001, duid=0x0, rng=rng)
    f2 = make_frame(nac=0xABC, duid=0xA, rng=rng)
    dib = np.concatenate([gap, f1, gap, f2, gap])
    blk = P25FrameSync(max_errors=0)
    st = blk.init_state()
    prm = blk.init_params()
    rows = []
    for i in range(0, len(dib), 64):
        chunk = np.zeros(64, np.uint8)
        part = dib[i:i + 64]
        chunk[:len(part)] = part
        st, (ev,) = blk.apply(st, prm, _stream(chunk, count=len(part)))
        rows.extend(_events(ev))
    rows = np.asarray(rows)
    assert len(rows) == 2
    assert rows[0][0] == 30 and int(rows[0][1]) == 0x001
    assert rows[1][0] == 30 + 56 + 30 and int(rows[1][1]) == 0xABC


def test_full_chain_c4fm():
    """IQ C4FM -> disc -> FSK4 -> frame sync recovers the NID."""
    from grbaz_tpu.models.p25 import P25Config, build_p25_rx, c4fm_modulate
    rng = np.random.default_rng(5)
    cfg = P25Config(channel_rate=48e3, block_size=1 << 12)
    frame = make_frame(nac=0x293, duid=0x5, payload_dibits=0, rng=rng)
    dibits = np.concatenate([
        rng.integers(0, 4, 300).astype(np.uint8), frame,
        rng.integers(0, 4, 644).astype(np.uint8)])
    iq = c4fm_modulate(dibits, cfg.channel_rate)
    fg, _ = build_p25_rx(cfg)
    step = jax.jit(fg.build_step())
    st, prm = fg.init_states(), fg.init_params()
    rows = []
    n = cfg.block_size
    for i in range(0, len(iq) - n + 1, n):
        stm = Stream(data=jnp.asarray(iq[i:i + n]), count=jnp.int32(n),
                     meta=StreamMeta.start(cfg.channel_rate))
        st, outs = step(st, prm, {"iq": stm})
        rows.extend(_events(outs["frames"]))
    rows = np.asarray(rows)
    assert len(rows) >= 1, "no frame sync found through the full chain"
    assert int(rows[0][1]) == 0x293 and int(rows[0][2]) == 0x5


def test_des_fips_vector():
    """FIPS 46-3 classic test vector."""
    from grbaz_tpu.utils.des import des_encrypt_block, key_schedule
    rk = key_schedule(0x133457799BBCDFF1)
    assert des_encrypt_block(0x0123456789ABCDEF, rk) == 0x85E813540F0AB405


def test_des_ofb_roundtrip():
    from grbaz_tpu.utils.des import ofb_crypt
    key, iv = 0x0123456789ABCDEF, 0x1234567890ABCDEF
    msg = bytes(range(23))  # non-multiple of block size
    ct = ofb_crypt(key, iv, msg)
    assert ct != msg
    assert ofb_crypt(key, iv, ct) == msg  # OFB is symmetric


def test_traffic_pane_from_frame_events():
    """Frame-sync events drive the traffic pane (op25_traffic_pane analog)."""
    from grbaz_tpu.viz.traffic import (TrafficPane, duid_name,
                                       frame_sync_events_to_attrs)
    rng = np.random.default_rng(3)
    dib = np.concatenate([
        rng.integers(0, 4, 30).astype(np.uint8),
        make_frame(nac=0x293, duid=0x5, payload_dibits=8, rng=rng),
        make_frame(nac=0x293, duid=0xA, payload_dibits=8, rng=rng),
    ])
    blk = P25FrameSync(max_errors=0)
    s, (ev,) = blk.apply(blk.init_state(), blk.init_params(), _stream(dib))
    rows = _events(ev)
    assert len(rows) == 2
    seen = []
    pane = TrafficPane(on_update=lambda f: seen.append(f["duid"]))
    for attrs in frame_sync_events_to_attrs(rows[:, 1], rows[:, 2]):
        pane.update(attrs)
    snap = pane.snapshot()
    assert snap["nac"] == "0x293" and snap["duid"] == "LDU2"
    assert seen == ["LDU1", "LDU2"]
    assert duid_name(0x5) == "LDU1"
    # extra keys ignored, partial updates keep other fields
    pane.update({"tgid": 101, "bogus": 1})
    assert pane.snapshot()["tgid"] == "101"
    assert pane.snapshot()["nac"] == "0x293"
    assert len(pane.to_rows()) == 3
    pane.clear()
    assert all(v == "" for v in pane.snapshot().values())
