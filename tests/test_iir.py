"""ops.iir: triangular-matmul one-pole recurrence vs serial reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grbaz_tpu.ops.iir import onepole_scan, state_at_count


def serial_onepole(b, a, y0):
    y = np.empty_like(b, dtype=np.float64)
    s = float(y0)
    for k in range(len(b)):
        s = a * s + b[k]
        y[k] = s
    return y


@pytest.mark.parametrize("n", [1, 5, 127, 128, 129, 1000, 4096, 31459])
@pytest.mark.parametrize("a", [0.0, 0.2, 0.757, 0.9999])
def test_onepole_matches_serial(n, a):
    rng = np.random.default_rng(n)
    b = rng.standard_normal(n).astype(np.float32)
    y0 = 0.37
    got = np.asarray(jax.jit(lambda bb: onepole_scan(bb, a, y0))(b))
    want = serial_onepole(b, a, y0)
    # scale-aware atol: f32 accumulation error grows with the value
    # scale (a ~ 1 random walks reach O(sqrt(1/(1-a^2))))
    atol = 5e-6 * (1.0 + np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=atol)


def test_onepole_traced_pole():
    rng = np.random.default_rng(0)
    b = rng.standard_normal(5000).astype(np.float32)

    @jax.jit
    def run(bb, a):
        return onepole_scan(bb, a, jnp.float32(0.0))

    for a in (0.1, 0.93):
        got = np.asarray(run(b, jnp.float32(a)))
        np.testing.assert_allclose(got, serial_onepole(b, a, 0.0),
                                   rtol=2e-5, atol=1e-4)


def test_onepole_long_stream_chaining():
    """Block chaining through the carried state equals one long run."""
    rng = np.random.default_rng(1)
    a, n, blocks = 0.757, 1024, 7
    b = rng.standard_normal(n * blocks).astype(np.float32)
    full = np.asarray(onepole_scan(jnp.asarray(b), a, 0.0))
    s = jnp.float32(0.0)
    parts = []
    for i in range(blocks):
        y = onepole_scan(jnp.asarray(b[i * n:(i + 1) * n]), a, s)
        s = y[-1]
        parts.append(np.asarray(y))
    chained = np.concatenate(parts)
    np.testing.assert_allclose(chained, full, rtol=2e-5, atol=1e-4)


def test_state_at_count():
    y = jnp.arange(10.0)
    assert float(state_at_count(y, jnp.int32(4), jnp.float32(-1))) == 3.0
    assert float(state_at_count(y, jnp.int32(0), jnp.float32(-1))) == -1.0
    assert float(state_at_count(y, jnp.int32(10), jnp.float32(-1))) == 9.0
