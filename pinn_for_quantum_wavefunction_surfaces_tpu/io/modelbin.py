"""Codec for the reference's bespoke ``model.bin`` checkpoint format.

Format (reference writer ``train.py:112-119``, readers ``energy.py:8-19`` /
``plot.py:6-17``): a concatenation of little-endian records

    [int32 ndim] [int32 dim_0] ... [int32 dim_{ndim-1}] [float64 raw data]

terminated by end-of-file (the readers stop when a 4-byte read returns empty,
which parses as ndim == 0). The minimal trainer stores exactly 16 tensors in
the fixed order H1a H1b H2a H2b H3a H3b L1a L1b L2a L2b E1a E1b E2a E2b E3a
E3b — i.e. weight/bias pairs for the correction MLP, gate and E head, with
weights already in (in, out) layout (matmul convention x @ A + b), which is
the same layout this framework uses natively.
"""

from __future__ import annotations

import io as _io
from typing import Iterable

import numpy as np

# Record order used by the reference minimal trainer (train.py:108-109).
MINIMAL_ORDER = ("H1a", "H1b", "H2a", "H2b", "H3a", "H3b",
                 "L1a", "L1b", "L2a", "L2b",
                 "E1a", "E1b", "E2a", "E2b", "E3a", "E3b")

# Mapping from the reference tensor names to this framework's param tree.
_TO_TREE = {
    "H1": "h1", "H2": "h2", "H3": "out",
    "L1": "gate1", "L2": "gate2",
    "E1": "e1", "E2": "e2", "E3": "eout",
}


def read_arrays(path: str) -> list[np.ndarray]:
    """Parse every record in a model.bin file."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            ndim = int.from_bytes(head, "little")
            if ndim == 0:
                break
            shape = [int.from_bytes(f.read(4), "little") for _ in range(ndim)]
            n = int(np.prod(shape)) * 8
            out.append(np.frombuffer(f.read(n), dtype="<f8").reshape(shape))
    return out


def write_arrays(path: str, arrays: Iterable[np.ndarray]) -> None:
    buf = _io.BytesIO()
    for a in arrays:
        a = np.ascontiguousarray(np.asarray(a, dtype="<f8"))
        buf.write(int(a.ndim).to_bytes(4, "little"))
        for d in a.shape:
            buf.write(int(d).to_bytes(4, "little"))
        buf.write(a.tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_params(path: str) -> dict:
    """model.bin -> param pytree for the `minimal` architecture."""
    arrays = read_arrays(path)
    if len(arrays) != 16:
        raise ValueError(f"expected 16 records, found {len(arrays)}")
    params: dict = {}
    for (name, w, b) in zip(MINIMAL_ORDER[0::2], arrays[0::2], arrays[1::2]):
        params[_TO_TREE[name[:-1]]] = {"w": w, "b": b}
    return params


def save_params(path: str, params: dict) -> None:
    """param pytree -> model.bin in the reference record order."""
    arrays = []
    for name in MINIMAL_ORDER[0::2]:
        sub = params[_TO_TREE[name[:-1]]]
        arrays.extend([np.asarray(sub["w"]), np.asarray(sub["b"])])
    write_arrays(path, arrays)
