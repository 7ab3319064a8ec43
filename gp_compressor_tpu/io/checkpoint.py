"""Checkpoint / resume for framework state.

The reference has no checkpointing at all for the GP pipeline — its
save_compressed ignores the filename and GP state lives only in memory
(src/gp_compressor.cpp:21-27); only the K-SVD artifact persists. Here any
NamedTuple/pytree state (SOGPState banks, CompressedCloud, MapState,
sampler states, PRNG keys) serializes to a single .npz with its tree
structure, so compression maps, mapping sessions and HMC chains can
resume across processes and hosts.

Loads are validated: the stored treedef string and per-leaf shapes must
match the `like` template, so a checkpoint cannot silently mis-assign
leaves into a structurally different (but leaf-count-compatible) tree.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def _leaf_to_np(v):
    if hasattr(v, "dtype") and jax.dtypes.issubdtype(
            getattr(v, "dtype", None), jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(v))
    return np.asarray(v)


def save(path: str, tree: Any, meta: dict | None = None) -> None:
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": _leaf_to_np(v) for i, v in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, like: Any, strict: bool = True) -> Any:
    """Restore into the structure of `like` (same pytree shape).

    strict=True (default) raises ValueError when the checkpoint's stored
    treedef or any leaf shape disagrees with `like`; prng-key leaves are
    compared by their key-data shape. strict=False skips the checks (for
    forward-compat loads where the container type was renamed but the
    leaf layout is unchanged).
    """
    with np.load(path) as data:
        flat_like, treedef = jax.tree_util.tree_flatten(like)
        if strict and "__treedef__" in data:
            stored = bytes(data["__treedef__"]).decode()
            if stored != str(treedef):
                raise ValueError(
                    f"checkpoint treedef mismatch:\n  stored: {stored}\n"
                    f"  expected: {treedef}")
        n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
        if n_stored != len(flat_like):
            raise ValueError(
                f"checkpoint has {n_stored} leaves, template has "
                f"{len(flat_like)}")
        leaves = []
        for i, ref in enumerate(flat_like):
            a = data[f"leaf_{i}"]
            ref_shape = np.shape(ref)
            if hasattr(ref, "dtype") and jax.dtypes.issubdtype(
                    getattr(ref, "dtype", None), jax.dtypes.prng_key):
                # typed PRNG keys flatten to their uint32 key data
                ref_shape = jax.random.key_data(ref).shape
                leaves.append(jax.random.wrap_key_data(jax.numpy.asarray(a)))
            else:
                leaves.append(jax.numpy.asarray(a))
            if strict and tuple(a.shape) != tuple(ref_shape):
                raise ValueError(
                    f"checkpoint leaf {i} shape {a.shape} != template "
                    f"{tuple(ref_shape)}")
        return jax.tree_util.tree_unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with np.load(path) as data:
        if "__meta__" in data:
            return json.loads(bytes(data["__meta__"]).decode())
    return {}
