"""Per-R multi-model sweep (legacy mode, re-designed)."""

import dataclasses

import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.training import sweep


def _cfg():
    cfg = pqs.smoke_config(dtype="float64")
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_train=512, epochs=30,
                                       scan_chunk=15))


def test_sequential_sweep():
    out = sweep.train_per_r(_cfg(), [1.0, 2.0])
    assert out["E_net"].shape == (2,)
    assert np.isfinite(out["E_net"]).all()
    assert len(out["params"]) == 2
    # deeper well at shorter bond: E(R=1) < E(R=2) electronically
    assert out["E_net"][0] < out["E_net"][1]


def test_vmapped_sweep_matches_shapes():
    rs = [0.8, 1.5, 2.5, 3.5]
    out = sweep.train_per_r_vmapped(_cfg(), rs)
    assert out["E_net"].shape == (4,)
    assert out["loss_history"].shape == (30, 4)
    assert np.isfinite(out["loss_history"]).all()
    # training reduced the loss for every member of the family
    assert (out["best_loss"] < out["loss_history"][0]).all()


def test_polish_sweep_hits_exact_per_r():
    """The deterministic per-R polish with the separable arch lands each
    family member within 0.01 mHa of its exact eigenvalue."""
    import dataclasses
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy \
        as aen
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable"))
    rs = [1.0, 2.0]
    out = sweep.polish_per_r(cfg, rs, steps=80, n_xi=24, n_eta=16)
    exact = aen.exact_energy_ode(np.asarray(rs))
    err = 1e3 * (out["E_net"] - exact)
    assert (err >= -1e-4).all(), err
    assert (err <= 0.01).all(), err
