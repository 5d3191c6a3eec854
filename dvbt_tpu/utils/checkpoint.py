"""Checkpoint / resume for carried-state pytrees (SURVEY.md §5.4).

The reference has NO checkpointing — its state lives in C++ block members
(interleaver FIFOs, PRBS phase, NCO phase, frame counters) and dies with the
process.  Here every chain's state is an explicit pytree, so mid-stream
suspend/resume is just serializing it; the same pytrees are the unit of
inter-chip state exchange (parallel/time_sharding.py).

np.savez-based (no orbax dependency needed for these KB-sized states); keys
are the joined tree paths so files are self-describing and stable.
"""

from __future__ import annotations

import io

import jax
import numpy as np


def _key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def state_to_arrays(state) -> dict:
    """Pytree -> {path: np.ndarray} (host copies)."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {}
    for path, leaf in flat:
        arr = np.asarray(jax.device_get(leaf))
        out[_key(path)] = arr
    return out


def save_state(path: str, state, **extra) -> None:
    """Serialize a carried-state pytree (+ optional scalar extras)."""
    arrays = state_to_arrays(state)
    arrays.update({f"__extra__/{k}": np.asarray(v) for k, v in extra.items()})
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Restore a pytree saved by save_state; `like` supplies the structure
    (e.g. models.rx.init_rx_state(mode)).  Returns (state, extras)."""
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    extras = {k.split("/", 1)[1]: data.pop(k)
              for k in list(data) if k.startswith("__extra__/")}
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        k = _key(p)
        if k not in data:
            raise KeyError(f"checkpoint missing leaf {k!r}")
        arr = data[k]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"leaf {k!r}: checkpoint shape {arr.shape} != {np.shape(leaf)}")
        leaves.append(jax.numpy.asarray(arr))
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves), extras
