"""Native checkpointing: flat-key ``.npz`` archives with a JSON manifest.

Replaces the reference's two ad-hoc mechanisms (torch ``.pt`` with Adam state,
reference ``poc/main.py:331-339``; bespoke ``model.bin``, ``train.py:112-119``)
with one self-describing format that round-trips arbitrary pytrees (params AND
optimizer state), so training can resume exactly — including the two-stage
fine-tune schedule (reference ``poc/main.py:930-942``).

Layout: a single ``.npz`` whose keys are '/'-joined tree paths, plus a
``__meta__`` JSON string (step, best_loss, user metadata). Works for optax
states (named tuples) by recording the node types needed to rebuild them.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np
import jax


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    paths_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths_leaves:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Save a pytree (+ JSON-serialisable metadata) to ``path`` (.npz)."""
    flat = _flatten(tree)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)  # atomic publish


def load_meta(path: str) -> dict:
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"]).decode())


def load(path: str, like: Any) -> tuple[Any, dict]:
    """Load a checkpoint into the structure of pytree ``like``.

    Returns (tree, meta). Shapes/dtypes come from the file; structure from
    ``like`` — so an optax opt_state template rebuilds its named tuples.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for p, leaf in leaves_paths:
            key = "/".join(_path_str(q) for q in p)
            if key not in z:
                raise KeyError(f"checkpoint {path} missing leaf {key!r}")
            leaves.append(z[key])
        return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save_params(path: str, params: dict, meta: Optional[dict] = None) -> None:
    save(path, params, meta)


def load_params(path: str) -> tuple[dict, dict]:
    """Load a params-only checkpoint without a template (plain nested dicts)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        out: dict = {}
        for key in z.files:
            if key == "__meta__":
                continue
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
        return out, meta
