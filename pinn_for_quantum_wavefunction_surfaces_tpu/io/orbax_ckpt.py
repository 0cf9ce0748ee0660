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
    """Atomic Orbax save of a pytree (+ JSON metadata) to directory ``path``.

    Metadata goes to the sibling file ``<path>.meta.json`` via tmp-file +
    ``os.replace`` BEFORE the Orbax commit: the finalized checkpoint
    directory is never mutated (Orbax's commit-marker integrity model), and
    a crash between the two steps leaves a stale meta without a checkpoint —
    recoverable — rather than a committed checkpoint without meta.
    """
    import os
    ocp = _checkpointer()
    apath = os.path.abspath(path)
    if meta:
        import json
        mpath = _meta_path(apath)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, mpath)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(apath, tree, force=True)


def _meta_path(apath: str) -> str:
    return apath.rstrip("/") + ".meta.json"


def load(path: str, like: Any):
    """Restore a pytree saved with :func:`save` into the structure of
    ``like`` (shapes/dtypes/shardings come from the template)."""
    import json
    import os
    ocp = _checkpointer()
    apath = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(apath, like)
    meta = {}
    # sibling file (current format), then legacy in-directory meta.json
    for meta_path in (_meta_path(apath), os.path.join(path, "meta.json")):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            break
    return tree, meta
