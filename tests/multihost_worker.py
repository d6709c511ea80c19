"""Worker for test_multihost: one of two processes driving the sharded
WBFM bank over a global (chan x time) mesh spanning both. Usage:
``python multihost_worker.py <pid> <port> <out.json>``."""

import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from grbaz_tpu.parallel.wbfm_bank import BankConfig, ShardedWBFMBank  # noqa: E402

# global mesh: 4 chan x 2 time over 8 devices on 2 hosts; the 'time'
# axis spans BOTH processes (devices alternate), so halo exchange
# crosses the process boundary (the DCN path).
devs = np.array(jax.devices()).reshape(4, 2)
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

state = multihost_utils.host_local_array_to_global_array(
    bank.init_state(), mesh,
    jax.tree_util.tree_map(lambda _: P(), bank.init_state()))
# state shardings: replicate-compatible specs (host-local identical)
params = bank.init_params(freqs)
xg = multihost_utils.host_local_array_to_global_array(x, mesh, P())

state, (audio, counts) = bank.step(state, params, xg)
audio_l = multihost_utils.global_array_to_host_local_array(audio, mesh, P())
counts_l = multihost_utils.global_array_to_host_local_array(counts, mesh, P())
audio_np = np.asarray(jax.device_get(audio_l))
counts_np = np.asarray(jax.device_get(counts_l))

if pid == 0:
    compacted = bank.compact_audio(audio_np, counts_np)
    json.dump({
        "counts": counts_np.tolist(),
        "audio_sum": [float(np.sum(np.abs(a))) for a in compacted],
        "audio_head": [a[:8].tolist() for a in compacted],
    }, open(out_path, "w"))
print(f"[{pid}] done", flush=True)
