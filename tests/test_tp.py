"""Tensor-parallel (tap-sharded) FIR vs the single-device kernel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grbaz_tpu.core.stream import Stream
from grbaz_tpu.ops.fir import (FIRDecimator, low_pass_taps)
from grbaz_tpu.parallel.tp import TPFIRDecimator, shard_taps
from tests.conftest import snr_db


@pytest.fixture(scope="module")
def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("tp",))


def run_serial(taps, decim, x, block):
    blk = FIRDecimator(taps, decim)
    state, params = blk.init_state(), blk.init_params()
    outs = []
    for i in range(0, len(x), block):
        s = Stream.full(jnp.asarray(x[i:i + block]))
        state, (y,) = blk.apply(state, params, s)
        outs.append(np.asarray(y.data)[:int(y.count)])
    return np.concatenate(outs)


def test_tp_fir_matches_serial_complex(mesh8):
    rng = np.random.default_rng(5)
    n, block, decim = 16384, 4096, 8
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    taps = low_pass_taps(1.0, 1.0, 0.05, 0.02)  # ~121 taps

    ref = run_serial(taps, decim, x, block)

    blk = TPFIRDecimator(taps, decim, mesh8)
    step = blk.make_step()
    state = jax.tree_util.tree_map(jnp.asarray, blk.init_state())
    params = {"h": jax.device_put(
        blk.init_params()["h"], NamedSharding(mesh8, P("tp", None)))}
    outs = []
    for i in range(0, n, block):
        state, y = step(state, params, jnp.asarray(x[i:i + block]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)

    assert got.shape == ref.shape
    assert snr_db(ref, got) > 120  # f32 partial-sum regrouping only


def test_tp_fir_real_long_filter(mesh8):
    """A 1025-tap matched filter sharded 8 ways."""
    rng = np.random.default_rng(6)
    n, block, decim = 8192, 4096, 4
    x = rng.standard_normal(n).astype(np.float32)
    taps = np.sinc(np.linspace(-8, 8, 1025)).astype(np.float32)

    ref = run_serial(taps, decim, x, block)
    blk = TPFIRDecimator(taps, decim, mesh8, dtype=jnp.float32)
    step = blk.make_step()
    state = jax.tree_util.tree_map(jnp.asarray, blk.init_state())
    params = {"h": jax.device_put(
        blk.init_params()["h"], NamedSharding(mesh8, P("tp", None)))}
    outs = []
    for i in range(0, n, block):
        state, y = step(state, params, jnp.asarray(x[i:i + block]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    assert got.shape == ref.shape
    assert snr_db(ref, got) > 120


def test_shard_taps_roundtrip():
    taps = np.arange(37, dtype=np.float32)
    chunks = shard_taps(taps, decim=4, n_shards=4)
    flat = chunks.reshape(-1)
    # trailing entries are the reversed taps; leading are zero pad
    assert np.array_equal(flat[-37:], taps[::-1])
    assert np.all(flat[:-37] == 0)
    assert chunks.shape[1] % 4 == 0
