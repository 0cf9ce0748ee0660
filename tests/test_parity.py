"""Parity against the reference's shipped artifacts (SURVEY.md section 6).

The strongest checks in the suite:
- the E(R) eigenvalue head evaluated on the reference fineTune checkpoint
  reproduces the shipped ``energy_R_ion.pkl`` E_net values to ~1e-15;
- the Rayleigh-quotient path (fused forward-Laplacian + Simpson quadrature)
  matches an independent torch-style nested-autodiff oracle to ~1e-12, and
  the shipped E_int/Elcao values to the tolerance attributable to the
  artifact's unrecorded grid settings (verified during bring-up: the shipped
  E_int is NOT reproducible even by a torch.autograd oracle on the recorded
  80^3 grid — the residual offset is in the artifact, not this code).
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
from pinn_for_quantum_wavefunction_surfaces_tpu.io import torch_pt
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz

REF = "/root/reference"


@pytest.fixture(scope="module")
def shipped():
    try:
        with open(f"{REF}/poc/energy_R_ion.pkl", "rb") as f:
            surf = pickle.load(f)
        p = torch_pt.load_reference_checkpoint(
            f"{REF}/models/ionHsym_fineTune.pt")
    except FileNotFoundError:
        pytest.skip("reference artifacts not mounted")
    p = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), p)
    return surf, p


def test_energy_head_parity(shipped):
    surf, p = shipped
    e = ansatz.energy(p, jnp.asarray(surf["R"], jnp.float64))
    np.testing.assert_allclose(np.asarray(e), surf["E_net"], atol=1e-12)


def test_rayleigh_quotient_parity(shipped):
    surf, p = shipped
    cfg = pqs.Config(dtype="float64")
    for idx, tol in ((18, 5e-4), (38, 2e-4)):  # R = 2.0, 4.0
        ri = float(surf["R"][idx])
        ei = aen.rayleigh_quotient(p, cfg, ri, n=80, scheme="avg")
        assert abs(ei - surf["E_int"][idx]) < tol


def test_lcao_baseline_parity(shipped):
    surf, p = shipped
    cfg = pqs.Config(dtype="float64")
    for idx, tol in ((18, 2e-4), (38, 1e-5)):
        ri = float(surf["R"][idx])
        el = aen.rayleigh_quotient(p, cfg, ri, n=80, scheme="avg",
                                   which="lcao")
        assert abs(el - surf["Elcao"][idx]) < tol


def test_accuracy_vs_exact_table(shipped):
    """The shipped model's E_net must beat LCAO and be within the published
    error band of the Wind exact energies (BASELINE.md)."""
    surf, p = shipped
    r = surf["R"]
    sel = (r >= 0.5)
    exact = aen.exact_energy(r[sel])
    err_net = np.abs(surf["E_net"][sel] - exact)
    assert err_net.max() < 0.025      # published max 23.7 mHa
    assert err_net.mean() < 0.004     # published mean 2.9 mHa
    err_lcao = np.abs(surf["Elcao"][sel] - exact)
    assert err_net.mean() < err_lcao.mean()


def test_loss_history_artifacts():
    """Shipped loss pickles parse and match BASELINE.md numbers."""
    try:
        with open(f"{REF}/poc/loss_ionH.pkl", "rb") as f:
            h = pickle.load(f)
    except FileNotFoundError:
        pytest.skip("reference artifacts not mounted")
    assert len(h["Ltot"]) == 5000
    assert abs(float(np.ravel(h["Ltot"])[-1]) - 7.42e-07) < 2e-8
    assert abs(float(np.min(h["Ltot"])) - 4.08e-07) < 2e-8


def test_reference_checkpoint_adapted_grid_regression(shipped):
    """Regression-pin the apples-to-apples scoring of the reference's
    shipped fineTune psi on this framework's converged adapted grids vs the
    exact ODE oracle (RESULTS.md 'Apples-to-apples' table). Tolerances are
    windows around the measured values (n=64, float64):
        R=0.2: +73.0 mHa   R=1.0: +10.4 mHa   R=2.0: +10.5 mHa
        R=4.0:  +0.9 mHa   (errors are variational-positive)
    """
    import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import (
        energy as aen, exact)
    _, ref_params = shipped
    params = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
              for k, v in ref_params.items()}
    cfg = pqs.Config(dtype="float64")
    rs = [0.2, 1.0, 2.0, 4.0]
    surf = aen.surface(params, cfg, r_values=rs, n=64, grid="adapted",
                       lcao=False)
    expected = {0.2: 73.024, 1.0: 10.403, 2.0: 10.483, 4.0: 0.916}
    for ri, e_int in zip(surf["R"], surf["E_int"]):
        err_mha = 1e3 * (float(e_int)
                         - exact.exact_electronic_energy(float(ri)))
        assert err_mha > 0, (ri, err_mha)  # variational bound
        assert abs(err_mha - expected[float(ri)]) < 0.05, (ri, err_mha)
