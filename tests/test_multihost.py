"""True multi-process execution: the sharded WBFM bank on a global mesh
spanning 2 processes (jax.distributed on CPU, gloo collectives) must
match the single-process 8-device run — the BASELINE 'N>=2 hosts'
configuration with the halo exchange crossing the process boundary."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_wbfm_bank_two_process_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "mh.json"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker)),
         env.get("PYTHONPATH", "")])
    procs = [subprocess.Popen(
        [sys.executable, "-u", worker, str(i), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        logs.append(o.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    got = json.loads(out.read_text())

    # single-process reference on the local 8-device CPU mesh
    import jax
    from jax.sharding import Mesh
    from grbaz_tpu.parallel.wbfm_bank import BankConfig, ShardedWBFMBank

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("chan", "time"))
    cfg = BankConfig(channels=4, block_size=4096 * 2, sample_rate=1.024e6,
                     decim=8, audio_rate=16e3, channel_width=100e3,
                     transition=100e3)
    bank = ShardedWBFMBank(cfg, mesh)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((cfg.channels, cfg.block_size))
         + 1j * rng.standard_normal((cfg.channels, cfg.block_size))
         ).astype(np.complex64)
    freqs = np.linspace(-200e3, 200e3, cfg.channels)
    state = jax.device_put(bank.init_state(), bank.state_shardings())
    params = bank.init_params(freqs)
    xg = jax.device_put(x, bank.input_sharding())
    state, (audio, counts) = bank.step(state, params, xg)
    ref = bank.compact_audio(np.asarray(audio), np.asarray(counts))

    assert got["counts"] == np.asarray(counts).tolist()
    for c in range(cfg.channels):
        np.testing.assert_allclose(
            np.asarray(got["audio_head"][c]), ref[c][:8], rtol=1e-5,
            err_msg=f"channel {c} multi-process audio differs")
        assert got["audio_sum"][c] == pytest.approx(
            float(np.sum(np.abs(ref[c]))), rel=1e-5)
