"""Build the excited-state spectrum figure from evaluated surfaces.

Reads the per-state ``energy_eval.pkl`` surfaces produced by ``cli
evaluate`` (keys R, E_int, E_net) and writes
artifacts/figures/spectrum.pdf — every trained state of the H2+ spectrum
vs the exact two-centre ODE oracle (capability beyond the reference,
which only reaches the lowest state of each inversion sector).

Usage: python benchmarks/spectrum.py [out.pdf]
Surfaces are looked up in the locations the Makefile recipes write to;
states whose surface is missing are skipped with a note.
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import plots  # noqa: E402

# state -> candidate surface pickles (first hit wins)
SOURCES = {
    "1ssg": ["artifacts/flagship_separable_energy.pkl",
             "artifacts/energy_eval.pkl"],
    "2psu": ["artifacts/ungerade_separable_energy.pkl"],
    "2ssg": ["artifacts/excited_2ssg_energy.pkl",
             "runs/excited_2ssg_cont/eval/energy_eval.pkl",
             "runs/excited_2ssg/eval/energy_eval.pkl"],
    "3psu": ["artifacts/excited_3psu_energy.pkl",
             "runs/excited_3psu/eval/energy_eval.pkl"],
    "3dsg": ["artifacts/excited_3dsg_energy.pkl",
             "runs/excited_3dsg/eval/energy_eval.pkl",
             "runs/excited_3dsg/energy_eval.pkl"],
    # pi/delta sectors (harmonic transverse factor, ModelConfig.m_abs)
    "2ppu": ["artifacts/pi_2ppu_energy.pkl",
             "runs/pi_2ppu/energy_eval.pkl"],
    "3dpg": ["artifacts/pi_3dpg_energy.pkl",
             "runs/pi_3dpg/energy_eval.pkl"],
    "3ddg": ["artifacts/delta_3ddg_energy.pkl",
             "runs/delta_3ddg/energy_eval.pkl"],
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "artifacts/figures/spectrum.pdf"
    states = {}
    for state, paths in SOURCES.items():
        for p in paths:
            if os.path.exists(p):
                with open(p, "rb") as f:
                    states[state] = pickle.load(f)
                break
        else:
            print(f"note: no surface for {state}, skipping")
    if not states:
        raise SystemExit("no surfaces found")
    path = plots.spectrum_figure(states, path=out)
    print(path)


if __name__ == "__main__":
    main()
