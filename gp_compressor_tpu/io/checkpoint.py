"""Checkpoint / resume for framework state.

The reference has no checkpointing at all for the GP pipeline — its
save_compressed ignores the filename and GP state lives only in memory
(src/gp_compressor.cpp:21-27); only the K-SVD artifact persists. Here any
NamedTuple/pytree state (SOGPState banks, CompressedCloud, MapState,
sampler states, PRNG keys) serializes to a single .npz with its tree
structure, so compression maps, mapping sessions and HMC chains can
resume across processes and hosts.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree: Any, meta: dict | None = None) -> None:
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (same pytree shape)."""
    with np.load(path) as data:
        flat_like, treedef = jax.tree_util.tree_flatten(like)
        leaves = []
        for i, ref in enumerate(flat_like):
            a = data[f"leaf_{i}"]
            leaves.append(jax.numpy.asarray(a))
        return jax.tree_util.tree_unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with np.load(path) as data:
        if "__meta__" in data:
            return json.loads(bytes(data["__meta__"]).decode())
    return {}
