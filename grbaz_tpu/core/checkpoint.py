"""Checkpoint / resume of flowgraph state.

The reference has no processing-state checkpointing (SURVEY.md §5 —
only capture/replay via file sources). Here all kernel state is
explicit pytrees of arrays (filter tails, resampler mu, AGC envelopes,
decoder FSM registers), so checkpointing is exact and trivial: flatten
with key paths, store as .npz, restore with dtype/shape validation.

Combined with the time-faithful FileSource, a receive session can be
stopped and resumed bit-exactly.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_state(path: str, states: Any, params: Any = None,
               extra: Dict[str, Any] = None):
    """Write states (+ optional params and scalar metadata) to .npz."""
    payload = {}
    for k, v in _flatten(states).items():
        payload["state/" + k] = v
    if params is not None:
        for k, v in _flatten(params).items():
            payload["param/" + k] = v
    for k, v in (extra or {}).items():
        payload["extra/" + k] = np.asarray(v)
    np.savez(path, **payload)


def load_state(path: str, states_template: Any,
               params_template: Any = None):
    """Restore (states, params, extra) shaped like the given templates.

    Shapes and dtypes are validated against the templates — a mismatch
    (changed graph topology/config) raises instead of corrupting state.
    """
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}

    def restore(template, prefix):
        leaves_p, treedef = jax.tree_util.tree_flatten_with_path(template)
        out = []
        for pth, leaf in leaves_p:
            key = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
            if key not in data:
                raise KeyError(f"checkpoint missing {key}")
            arr = data[key]
            ref = np.asarray(leaf)
            if arr.shape != ref.shape or arr.dtype != ref.dtype:
                raise ValueError(
                    f"{key}: checkpoint {arr.dtype}{arr.shape} vs "
                    f"template {ref.dtype}{ref.shape}")
            out.append(arr)
        return jax.tree_util.tree_unflatten(treedef, out)

    states = restore(states_template, "state/")
    params = restore(params_template, "param/") \
        if params_template is not None else None
    extra = {k[len("extra/"):]: data[k] for k in data if k.startswith("extra/")}
    return states, params, extra
