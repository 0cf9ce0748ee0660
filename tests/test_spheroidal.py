"""Prolate-spheroidal Gauss quadrature (the two-centre-exact coordinates)."""

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz


def test_lcao_overlap_analytic():
    """<1s_a|1s_b> for unit exponents has the closed form
    S = e^{-d}(1 + d + d^2/3), d = internuclear distance. Verify the
    spheroidal machinery through <LCAO|LCAO> = 2 pi (1 + S) ... using the
    normalisation <1s|1s> = pi:  <LCAO|LCAO> = 2 pi (1 + S)."""
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    ri = 1.0
    d = 2.0 * ri

    # reuse the quotient plumbing to get den = <LCAO|LCAO>
    import functools
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis.energy import \
        rayleigh_quotient_spheroidal
    # numerator/denominator are not exposed; check the quotient instead
    # against the analytic LCAO energy expression:
    # E = (h_aa + h_ab) / (1 + S) with
    # h_aa = -1/2 - 1/d + e^{-2d}(1 + 1/d)
    # h_ab = -S/2 - e^{-d}(1 + d)
    s_ab = np.exp(-d) * (1 + d + d * d / 3.0)
    j = -1.0 / d + np.exp(-2 * d) * (1.0 + 1.0 / d)
    k = -np.exp(-d) * (1.0 + d)
    e_analytic = (-0.5 + j + k - 0.5 * s_ab) / (1.0 + s_ab)
    e_num = rayleigh_quotient_spheroidal(params, cfg, ri, which="lcao")
    np.testing.assert_allclose(e_num, e_analytic, atol=5e-10)


def test_spheroidal_converges_fast():
    """n_xi=48 and n_xi=160 agree to ~1e-9 (spectral convergence — the
    Cartesian grids need 512k+ points for 1e-4)."""
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(1), cfg.model, jnp.float64)
    a = aen.rayleigh_quotient_spheroidal(params, cfg, 1.5, n_xi=48, n_eta=48)
    b = aen.rayleigh_quotient_spheroidal(params, cfg, 1.5, n_xi=160,
                                         n_eta=160)
    assert abs(a - b) < 1e-8


def test_spheroidal_vs_adapted_cartesian():
    """Cross-check the two independent quadratures on the smooth LCAO case
    (for random untrained psi the Cartesian grid's own error dominates)."""
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(2), cfg.model, jnp.float64)
    sph = aen.rayleigh_quotient_spheroidal(params, cfg, 2.0, which="lcao")
    ada = aen.rayleigh_quotient_adapted(params, cfg, 2.0, n=160,
                                        which="lcao")
    assert abs(sph - ada) < 2e-4
