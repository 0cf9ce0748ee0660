"""Optional Orbax-backed checkpointing (production path for pod-scale runs).

The default `.npz` format (io/checkpoint.py) is self-contained and fine for
single-host work. Orbax adds what multi-host production needs: atomic
directory commits, async saves, and per-shard io when params/opt state are
sharded over a mesh. Gated import — everything raises a clear error if orbax
is unavailable rather than failing at import time.
"""

from __future__ import annotations

from typing import Any, Optional


def _checkpointer():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "orbax-checkpoint is not installed; use io.checkpoint (npz) "
            "instead") from e
    return ocp


def save(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Atomic Orbax save of a pytree (+ JSON metadata) to directory ``path``."""
    import os
    ocp = _checkpointer()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)
    if meta:
        import json
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def load(path: str, like: Any):
    """Restore a pytree saved with :func:`save` into the structure of
    ``like`` (shapes/dtypes/shardings come from the template)."""
    import json
    import os
    ocp = _checkpointer()
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path), like)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
