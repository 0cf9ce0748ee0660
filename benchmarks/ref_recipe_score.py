"""Score the reference-recipe replication runs (VERDICT round-2 item 2).

Each seed in runs/ref_recipe/s* was trained with the reference's EXACT f64
schedule (plain residual loss, 5000 epochs constant lr 8e-3, n=100k, then a
2000-epoch lr 5e-4 E-head fine-tune — reference poc/main.py:914-942). This
script scores each stage-2 checkpoint's E_net AND E_int against the exact
ODE oracle on the machine-precision spheroidal grid, printing one JSON line
per seed — the measured answer to "does the reference's own config
reproduce its ~3 mHa artifact under this framework, or fall into the
degenerate basins RESULTS.md documents for long plain-loss f64 runs?"

CPU job: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/ref_recipe_score.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

from pinn_for_quantum_wavefunction_surfaces_tpu import Config  # noqa: E402
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import (  # noqa: E402
    energy as aen)
from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint  # noqa: E402


def main() -> None:
    cfg = Config(dtype="float64")
    root = os.path.join(os.path.dirname(__file__), "..", "runs",
                        "ref_recipe")
    for run in sorted(glob.glob(os.path.join(root, "s*", "stage2",
                                             "finetune.npz"))):
        params, _ = checkpoint.load_params(run)
        params = params.get("params", params)
        params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
                  for k, v in params.items()}
        surf = aen.surface(params, cfg, lcao=False, grid="spheroidal")
        exact = aen.exact_energy_ode(surf["R"])
        e_net = 1e3 * (surf["E_net"] - exact)
        e_int = 1e3 * (surf["E_int"] - exact)
        sel = surf["R"] >= 0.5
        print(json.dumps({
            "run": os.path.relpath(run, root),
            "net_mean_mHa": round(float(np.abs(e_net).mean()), 3),
            "net_max_mHa": round(float(np.abs(e_net).max()), 3),
            "net_mean_mHa_R>=0.5": round(float(np.abs(e_net[sel]).mean()), 3),
            "int_mean_mHa": round(float(np.abs(e_int).mean()), 3),
            "int_max_mHa": round(float(np.abs(e_int).max()), 3),
            "int_min_signed_mHa": round(float(e_int.min()), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
