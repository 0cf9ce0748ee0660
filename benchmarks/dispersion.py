"""Per-R dispersion study: exact family optima vs the parametric surface.

Runs the DETERMINISTIC per-R spheroidal polish (training/sweep.polish_per_r)
over the full 39-R grid for both ansatz families —

  - "GZ + gate*NN(f1,f2)" (the reference-parity symmetric family with the
    Guillemin-Zener physics part and trainable exponents), and
  - "separable-spheroidal" (the flagship family),

— landing every member at its per-R variational optimum, then emits the
variational-gap figure (analysis.plots.dispersion_gap_figure): each family's
per-R floor vs the exact ODE oracle, with the parametric flagship surface
overlaid. This is the working redesign of the reference's vestigial
multi-model mode (trainMultipleModels/plot_EforR, poc/main.py:680-910).

CPU f64 job (~30 min):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/dispersion.py
"""

from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)   # f64 polish (f32 LBFGS diverges)

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs  # noqa: E402
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import (  # noqa: E402
    energy as aen, plots)
from pinn_for_quantum_wavefunction_surfaces_tpu.training import sweep  # noqa: E402


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "runs",
                           "dispersion")
    fig_dir = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "figures")
    os.makedirs(out_dir, exist_ok=True)
    rs = np.round(np.arange(0.2, 4.0 + 1e-9, 0.1), 2)

    families = {
        "separable family (per-R optima)": pqs.Config(
            dtype="float64", model=pqs.ModelConfig(arch="separable")),
        "GZ + gate*NN family (per-R optima)": pqs.Config(
            dtype="float64", model=pqs.ModelConfig(
                gz=True, trainable_exponent=True)),
    }
    sweeps = {}
    for label, cfg in families.items():
        print(f"== {label}", flush=True)
        out = sweep.polish_per_r(cfg, rs, steps=300, n_xi=40, n_eta=24)
        out.pop("params")          # the pickle records the surface only
        sweeps[label] = out
        exact = aen.exact_energy_ode(rs)
        err = 1e3 * (out["E_net"] - exact)
        print(json.dumps({"family": label,
                          "mean_gap_mHa": round(float(np.abs(err).mean()), 5),
                          "max_gap_mHa": round(float(np.abs(err).max()), 5),
                          "min_signed_mHa": round(float(err.min()), 6)}),
              flush=True)

    with open(os.path.join(out_dir, "dispersion.pkl"), "wb") as f:
        pickle.dump(sweeps, f)

    parametric = None
    surf_path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                             "energy_eval.pkl")
    if os.path.exists(surf_path):
        parametric = aen.load_surface(surf_path)
    path = plots.dispersion_gap_figure(
        sweeps, os.path.join(fig_dir, "dispersion.pdf"),
        parametric=parametric)
    print(json.dumps({"figure": path}), flush=True)


if __name__ == "__main__":
    main()
