"""Pure-numpy inference replica: psi and E(R) with no JAX (or torch).

Parity counterpart of the reference's torch-free readers (reference
``energy.py:22-35``, ``plot.py:20-57``), which exist to prove the model is
fully specified by its weight arrays alone. Works with params loaded from
any of the three checkpoint formats (npz / model.bin / .pt) and both
architectures.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def energy(params: dict, r: np.ndarray) -> np.ndarray:
    """E(R) eigenvalue head, numpy only (reference energy.py:31-33)."""
    r = np.asarray(r, np.float64)[..., None]
    e = _sigmoid(r @ params["e1"]["w"] + params["e1"]["b"])
    e = _sigmoid(e @ params["e2"]["w"] + params["e2"]["b"])
    return (e @ params["eout"]["w"] + params["eout"]["b"])[..., 0]


def gate(params: dict, r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, np.float64)[..., None]
    g = _sigmoid(r @ params["gate1"]["w"] + params["gate1"]["b"])
    return (g @ params["gate2"]["w"] + params["gate2"]["b"])[..., 0]


def psi(params: dict, x, y, z, r, arch: str = "symmetric",
        inversion_symmetry: int = 1, ry: float = 0.0,
        rz: float = 0.0) -> np.ndarray:
    """Full ansatz forward, numpy only (reference plot.py:36-49 for the
    minimal architecture; the symmetric branch mirrors
    models/ansatz.py)."""
    x, y, z, r = (np.asarray(a, np.float64) for a in (x, y, z, r))
    p = inversion_symmetry

    def envelopes(xs):
        r1 = np.sqrt((xs - r) ** 2 + (y - ry) ** 2 + (z - rz) ** 2)
        r2 = np.sqrt((xs + r) ** 2 + (y + ry) ** 2 + (z + rz) ** 2)
        return np.exp(-r1), np.exp(-r2)

    def base(f1, f2):
        h = np.stack([f1, f2], axis=-1)
        h = _sigmoid(h @ params["h1"]["w"] + params["h1"]["b"])
        return _sigmoid(h @ params["h2"]["w"] + params["h2"]["b"])

    f1, f2 = envelopes(x)
    g = gate(params, r)
    if arch == "minimal":
        nn = (2.0 * base(f1, f2)) @ params["out"]["w"] + params["out"]["b"]
        return f1 + f2 + nn[..., 0] * g
    f1m, f2m = envelopes(-x)
    b = base(f1, f2) + p * base(f1m, f2m)
    nn = b @ params["out"]["w"] + params["out"]["b"]
    return nn[..., 0] * g + f1 + p * f2
