"""Host<->device IO laundering for restricted PJRT transports.

Empirical finding on the target TPU attachment (remote PJRT tunnel):
only **float32** buffers transfer reliably between host and device —
complex64 / int32 / int16 / uint8 transfers fail (UNIMPLEMENTED) or
hang, while f32 of any size and in-device compute on every dtype work
fine.

This module makes the dtype question disappear at the jit boundary:

* host side: any np array is *encoded* to a flat float32 view (bitwise,
  no value conversion) plus a static spec;
* device side (inside jit): the f32 buffer is *decoded* back to the true
  dtype with bitcasts/complex assembly — pure in-graph ops, free after
  fusion;
* and symmetrically for outputs.

Encoding is bit-exact for every dtype. When the backend has full
transfer support (CPU, standard TPU runtimes) laundering is a no-op
passthrough (``enabled=False``), so the same executor code runs
everywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_FORCE = None  # test hook


def launder_enabled() -> bool:
    """True when host<->device traffic must be f32-only.

    The restricted transport is the remote "axon" PJRT tunnel; it
    registers its platform under the canonical name "tpu", so detection
    goes through the environment that bootstraps it.
    """
    if _FORCE is not None:
        return _FORCE
    import os
    if "axon" not in os.environ.get("JAX_PLATFORMS", "") and \
            not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


@dataclasses.dataclass(frozen=True)
class IOSpec:
    """Static description of the true leaf: dtype + shape (+ pad info)."""
    dtype: str
    shape: Tuple[int, ...]

    @property
    def size(self):
        s = 1
        for d in self.shape:
            s *= d
        return s


# ---------------------------------------------------------------------------
# host-side encode (np -> f32 np)
# ---------------------------------------------------------------------------

def host_encode(x) -> Tuple[np.ndarray, IOSpec]:
    x = np.asarray(x)
    spec = IOSpec(dtype=x.dtype.name, shape=tuple(x.shape))
    flat = np.ascontiguousarray(x).reshape(-1)
    dt = x.dtype
    if dt == np.float32:
        enc = flat
    elif dt == np.complex64:
        enc = flat.view(np.float32)  # interleaved re/im, 2N
    elif dt in (np.int32, np.uint32):
        enc = flat.view(np.float32)
    elif dt in (np.int16, np.uint16):
        if flat.size % 2:
            flat = np.concatenate([flat, np.zeros(1, dt)])
        enc = flat.view(np.float32)
    elif dt in (np.int8, np.uint8):
        pad = (-flat.size) % 4
        if pad:
            flat = np.concatenate([flat, np.zeros(pad, dt)])
        enc = flat.view(np.float32)
    elif dt == np.bool_:
        enc = flat.astype(np.float32)
    elif dt == np.float64:
        raise TypeError("float64 has no TPU transport; convert on host")
    else:
        raise TypeError(f"unsupported launder dtype {dt}")
    return enc, spec


# ---------------------------------------------------------------------------
# in-jit decode (f32 traced -> true dtype traced)
# ---------------------------------------------------------------------------

def jit_decode(enc: jax.Array, spec: IOSpec) -> jax.Array:
    dt = np.dtype(spec.dtype)
    n = spec.size
    if dt == np.float32:
        out = enc
    elif dt == np.complex64:
        pairs = enc.reshape(-1, 2)
        out = lax.complex(pairs[:, 0], pairs[:, 1])
    elif dt in (np.int32, np.uint32):
        out = lax.bitcast_convert_type(enc, jnp.int32).astype(dt)
    elif dt in (np.int16, np.uint16):
        v = lax.bitcast_convert_type(enc, jnp.int32)
        lo = (v << 16) >> 16  # arithmetic: sign-extended low half
        hi = v >> 16
        out = jnp.stack([lo, hi], axis=-1).reshape(-1)[:n].astype(dt)
    elif dt in (np.int8, np.uint8):
        v = lax.bitcast_convert_type(enc, jnp.int32)
        bytes_ = [((v << (24 - 8 * k)) >> 24) for k in range(4)]
        out = jnp.stack(bytes_, axis=-1).reshape(-1)[:n].astype(dt)
    elif dt == np.bool_:
        out = enc != 0
    else:
        raise TypeError(f"unsupported launder dtype {dt}")
    return out.reshape(spec.shape)


# ---------------------------------------------------------------------------
# in-jit encode (true dtype traced -> f32 traced)
# ---------------------------------------------------------------------------

def jit_encode(x: jax.Array) -> Tuple[jax.Array, IOSpec]:
    spec = IOSpec(dtype=np.dtype(x.dtype).name, shape=tuple(x.shape))
    flat = x.reshape(-1)
    dt = np.dtype(x.dtype)
    if dt == np.float32:
        enc = flat
    elif dt == np.complex64:
        enc = jnp.stack([flat.real, flat.imag], axis=-1).reshape(-1)
    elif dt in (np.int32, np.uint32):
        enc = lax.bitcast_convert_type(flat.astype(jnp.int32), jnp.float32)
    elif dt in (np.int16, np.uint16):
        v = flat.astype(jnp.int32) & 0xFFFF
        if v.shape[0] % 2:
            v = jnp.concatenate([v, jnp.zeros(1, jnp.int32)])
        pairs = v.reshape(-1, 2)
        packed = pairs[:, 0] | (pairs[:, 1] << 16)
        enc = lax.bitcast_convert_type(packed, jnp.float32)
    elif dt in (np.int8, np.uint8):
        v = flat.astype(jnp.int32) & 0xFF
        pad = (-v.shape[0]) % 4
        if pad:
            v = jnp.concatenate([v, jnp.zeros(pad, jnp.int32)])
        quads = v.reshape(-1, 4)
        packed = (quads[:, 0] | (quads[:, 1] << 8)
                  | (quads[:, 2] << 16) | (quads[:, 3] << 24))
        enc = lax.bitcast_convert_type(packed, jnp.float32)
    elif dt == np.bool_:
        enc = flat.astype(jnp.float32)
    else:
        raise TypeError(f"unsupported launder dtype {dt}")
    return enc, spec


# ---------------------------------------------------------------------------
# host-side decode (f32 np -> true dtype np)
# ---------------------------------------------------------------------------

def host_decode(enc: np.ndarray, spec: IOSpec) -> np.ndarray:
    dt = np.dtype(spec.dtype)
    n = spec.size
    enc = np.asarray(enc)
    if dt == np.float32:
        out = enc.reshape(-1)
    elif dt == np.complex64:
        out = enc.reshape(-1).view(np.complex64)
    elif dt in (np.int32, np.uint32, np.int16, np.uint16, np.int8, np.uint8):
        out = enc.reshape(-1).view(dt)
    elif dt == np.bool_:
        out = enc.reshape(-1) != 0
    else:
        raise TypeError(f"unsupported launder dtype {dt}")
    return out[:n].reshape(spec.shape)


# ---------------------------------------------------------------------------
# pytree wrappers
# ---------------------------------------------------------------------------

def tree_host_encode(tree) -> Tuple[Any, Any]:
    """(pytree of np) -> (pytree of f32 np, pytree of IOSpec)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    enc, specs = [], []
    for l in leaves:
        e, s = host_encode(l)
        enc.append(e)
        specs.append(s)
    return (jax.tree_util.tree_unflatten(treedef, enc),
            jax.tree_util.tree_unflatten(treedef, specs))


def tree_jit_decode(enc_tree, spec_tree):
    return jax.tree_util.tree_map(
        jit_decode, enc_tree, spec_tree,
        is_leaf=lambda x: isinstance(x, IOSpec))


def tree_jit_encode(tree) -> Tuple[Any, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    enc, specs = [], []
    for l in leaves:
        e, s = jit_encode(l)
        enc.append(e)
        specs.append(s)
    return (jax.tree_util.tree_unflatten(treedef, enc),
            jax.tree_util.tree_unflatten(treedef, specs))


def tree_host_decode(enc_tree, spec_tree):
    return jax.tree_util.tree_map(
        lambda e, s: host_decode(np.asarray(e), s), enc_tree, spec_tree)
