import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

tid = sys.argv[1]
n = 1 << 17
rng = np.random.default_rng(0)
xc = jnp.asarray((rng.standard_normal(n, np.float32)
                  + 1j * rng.standard_normal(n, np.float32)).astype(np.complex64))
xf = jnp.asarray(rng.standard_normal(n, np.float32).astype(np.float32))
scales = jnp.asarray(1.0 + np.arange(8, dtype=np.float32) * 1e-6)

if tid == "a":  # complex input, f32 carry, elementwise
    @jax.jit
    def f(x, scales):
        def body(c, sc):
            y = x * sc
            return c + jnp.abs(y[0]), jnp.sum(jnp.abs(y[:4]))
        c, o = jax.lax.scan(body, jnp.float32(0), scales)
        return c + jnp.sum(o)
    print("a:", float(f(xc, scales)))
elif tid == "b":  # complex carry vector
    @jax.jit
    def f(x, scales):
        def body(c, sc):
            y = x * sc
            return c + y[:160], jnp.sum(jnp.abs(y[:4]))
        c, o = jax.lax.scan(body, jnp.zeros(160, jnp.complex64), scales)
        return jnp.sum(jnp.abs(c)) + jnp.sum(o)
    print("b:", float(f(xc, scales)))
elif tid == "c":  # f32 only, same structure
    @jax.jit
    def f(x, scales):
        def body(c, sc):
            y = x * sc
            return c + y[:160], jnp.sum(jnp.abs(y[:4]))
        c, o = jax.lax.scan(body, jnp.zeros(160, jnp.float32), scales)
        return jnp.sum(jnp.abs(c)) + jnp.sum(o)
    print("c:", float(f(xf, scales)))
elif tid == "d":  # complex math no scan
    @jax.jit
    def f(x):
        y = x * jnp.exp(1j * jnp.float32(0.1))
        return jnp.sum(jnp.abs(y))
    print("d:", float(f(xc)))
elif tid == "e":  # atan2 in scan
    @jax.jit
    def f(x, scales):
        def body(c, sc):
            y = jnp.arctan2(x * sc, 1.0 + x)
            return c + y[0], jnp.sum(y[:4])
        c, o = jax.lax.scan(body, jnp.float32(0), scales)
        return c + jnp.sum(o)
    print("e:", float(f(xf, scales)))
elif tid == "f":  # concat in scan with carry
    @jax.jit
    def f(x, scales):
        def body(c, sc):
            y = jnp.concatenate([c, x * sc])
            return y[-160:], jnp.sum(y[:4])
        c, o = jax.lax.scan(body, jnp.zeros(160, jnp.float32), scales)
        return jnp.sum(c) + jnp.sum(o)
    print("f:", float(f(xf, scales)))
