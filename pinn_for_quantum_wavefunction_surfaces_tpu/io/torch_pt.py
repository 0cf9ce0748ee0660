"""Torch-free reader for PyTorch ``.pt`` checkpoints (zip serialization).

Lets this framework load the reference's shipped checkpoints
(``models/ionHsym.pt``, ``models/ionHsym_fineTune.pt`` — saved by reference
``poc/main.py:331-339`` as ``{"model_state_dict", "optimizer_state_dict"}``)
without importing torch: the ``.pt`` file is a zip archive holding a pickle
stream (``data.pkl``) whose tensors are persistent-id references into raw
little-endian storage blobs (``data/<key>``).

Only what checkpoint dictionaries need is implemented: tensor rebuilds
(``torch._utils._rebuild_tensor_v2``), typed/untyped storages, and scalar
tensors. Device tags (e.g. ``cuda:0``) are ignored — everything loads as
numpy on host.
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any

import numpy as np

_DTYPES = {
    "DoubleStorage": np.float64, "FloatStorage": np.float32,
    "HalfStorage": np.float16, "LongStorage": np.int64,
    "IntStorage": np.int32, "ShortStorage": np.int16,
    "CharStorage": np.int8, "ByteStorage": np.uint8,
    "BoolStorage": np.bool_, "BFloat16Storage": None,  # no numpy bf16
}


class _StorageType:
    """Stub for torch.XStorage classes referenced by persistent ids."""

    def __init__(self, name: str):
        self.name = name


class _Storage:
    def __init__(self, data: np.ndarray):
        self.data = data


def _rebuild_tensor_v2(storage: _Storage, offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    flat = storage.data
    if not size:  # scalar tensor
        return flat[offset].copy()
    # strides are in elements; build a strided view then materialise
    itemsize = flat.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=tuple(size),
        strides=tuple(s * itemsize for s in stride))
    return np.array(view)


def _rebuild_parameter(tensor, requires_grad=True, backward_hooks=None):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, load_blob):
        super().__init__(file)
        self._load_blob = load_blob

    def find_class(self, module: str, name: str) -> Any:
        if module == "torch._utils":
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch.storage" and name == "_load_from_bytes":
            raise ValueError("legacy (non-zip) torch files are not supported")
        if module == "collections" and name == "OrderedDict":
            import collections
            return collections.OrderedDict
        if (module, name) == ("torch.serialization", "_get_layout"):
            return lambda *a: None
        if module.startswith("torch"):
            # benign enums/dtypes referenced but unused for plain checkpoints
            return lambda *a, **k: None
        # Strict allowlist: everything a checkpoint dict legitimately needs is
        # handled above; falling through to the unrestricted default would let
        # an untrusted .pt execute arbitrary code via __reduce__ payloads.
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}: not in the checkpoint "
            "allowlist (torch tensor rebuilds + collections.OrderedDict)")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage"
        name = getattr(storage_type, "name", "UntypedStorage")
        dtype = _DTYPES.get(name, np.uint8)
        if dtype is None:
            raise ValueError(f"unsupported storage dtype {name}")
        raw = self._load_blob(str(key))
        return _Storage(np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder("<")))


def load(path: str) -> Any:
    """Load a zip-format torch checkpoint into plain python/numpy objects."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def load_blob(key: str) -> bytes:
            return zf.read(f"{prefix}data/{key}")

        with zf.open(pkl_name) as f:
            return _Unpickler(f, load_blob).load()


# Mapping: reference NN_ion state_dict names -> our param tree
# (reference poc/main.py:234-245). torch Linear stores weight (out, in);
# this framework uses (in, out), hence the transpose.
_STATE_DICT_MAP = {
    "Lin_H1": "h1", "Lin_H2": "h2", "Lin_out": "out",
    "Lin_E1": "e1", "Lin_E2": "e2", "Lin_Eout": "eout",
    "netDecayL": "gate1", "netDecay": "gate2",
}


def state_dict_to_params(state_dict: dict) -> dict:
    """Convert an NN_ion state_dict (names above) into our param pytree."""
    params: dict = {}
    for torch_name, ours in _STATE_DICT_MAP.items():
        w = np.asarray(state_dict[f"{torch_name}.weight"])
        b = np.asarray(state_dict[f"{torch_name}.bias"])
        params[ours] = {"w": w.T.copy(), "b": b}
    return params


def params_to_state_dict(params: dict) -> dict:
    """Inverse of :func:`state_dict_to_params` (for exporting to .pt tools)."""
    sd = {}
    for torch_name, ours in _STATE_DICT_MAP.items():
        sd[f"{torch_name}.weight"] = np.asarray(params[ours]["w"]).T.copy()
        sd[f"{torch_name}.bias"] = np.asarray(params[ours]["b"])
    return sd


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference ``.pt`` checkpoint into this framework's param tree."""
    ck = load(path)
    return state_dict_to_params(ck["model_state_dict"])


def save_reference_checkpoint(path: str, params: dict) -> None:
    """Write a ``.pt`` checkpoint the reference's ``loadModel`` can read
    (``{"model_state_dict": ...}``, reference poc/main.py:325-339).

    Requires torch (available CPU-only in this image); gated import so the
    rest of the io layer stays torch-free."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(".pt export needs torch installed") from e
    sd = {k: torch.tensor(v) for k, v in params_to_state_dict(params).items()}
    torch.save({"model_state_dict": sd, "optimizer_state_dict": {}}, path)
