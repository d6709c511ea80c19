"""Test harness: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / the driver; unit tests
validate numerics and sharding on host CPU so they run anywhere.
"""

import os

# Force CPU: the image's sitecustomize force-registers a remote TPU
# backend ("axon") and sets jax_platforms="axon,cpu" at interpreter
# start, overriding the environment. Unit tests must run locally, so we
# override the jax config *after* that registration (backends initialize
# lazily — this is effective as long as no device op ran yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


def snr_db(ref, test):
    """Signal-to-error ratio in dB between two sample vectors."""
    ref = np.asarray(ref)
    test = np.asarray(test)
    err = ref - test
    p_sig = np.mean(np.abs(ref) ** 2)
    p_err = np.mean(np.abs(err) ** 2)
    if p_err == 0:
        return np.inf
    return 10.0 * np.log10(p_sig / p_err)
