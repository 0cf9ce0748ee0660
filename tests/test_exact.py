"""Exact prolate-spheroidal two-centre solver: the in-repo >=10-digit oracle.

Validation sources:
- the Wind (1965) 4-decimal table embedded in the reference
  (poc/main.py:48-61) — agreement must be within its +-0.5e-4 rounding;
- machine-precision literature eigenvalues at D = 2 a0 (R = 1):
  1s sigma_g  E_el = -1.1026342144949  (e.g. Scott et al., and every
  high-precision H2+ tabulation since Wind),
  2p sigma_u  E_el = -0.6675343922024;
- united-atom limit: D -> 0 gives He+ 1s, E -> -2 (gerade).
"""

import numpy as np
import pytest

from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import exact


def test_matches_literature_at_r1():
    e = exact.exact_electronic_energy(1.0, "1ssg")
    assert abs(e - (-1.1026342144949)) < 1e-10
    eu = exact.exact_electronic_energy(1.0, "2psu")
    assert abs(eu - (-0.6675343922024)) < 1e-10


def test_matches_wind_table_within_its_rounding():
    """Every Wind entry (39 R values) must agree to its published precision
    (4 decimals => |err| <= 0.5e-4 + solver tolerance)."""
    es = exact.exact_surface(aen.WIND_R, "1ssg", guesses=aen.WIND_E)
    err = np.abs(es - aen.WIND_E)
    assert err.max() < 5.05e-5, (aen.WIND_R[err.argmax()], err.max())


def test_united_atom_limit_gerade():
    # D -> 0: He+ 1s, E_el -> -Z^2/2 = -2
    e = exact.exact_electronic_energy(0.01, "1ssg")
    assert -2.0 < e < -1.98


def test_ungerade_curve_shape():
    # 2p sigma_u is repulsive: total E above the H(1s) dissociation limit
    # (-0.5) at chemical distances...
    e_tot_r2 = exact.exact_total_energy(2.0, "2psu")  # D = 4 a0
    assert -0.5 < e_tot_r2 < -0.40
    # ...except the famous shallow van-der-Waals minimum near D ~ 12.5 a0
    # (depth a few 1e-5 Ha below -0.5)
    e_tot_vdw = exact.exact_total_energy(6.25, "2psu")
    assert -0.5002 < e_tot_vdw < -0.5


def test_oracle_plumbing_through_energy_module():
    r = np.array([0.5, 1.0, 2.0])
    ode = aen.exact_energy(r, oracle="ode")
    wind = aen.exact_energy(r, oracle="wind")
    assert np.abs(ode - wind).max() < 5.05e-5
    np.testing.assert_allclose(aen.exact_energy_ode(r), ode, rtol=0,
                               atol=1e-12)
    with pytest.raises(ValueError):
        aen.exact_energy(r, oracle="nope")


def test_guess_and_scan_paths_agree():
    e_guided = exact.exact_electronic_energy(1.3, "1ssg",
                                             guess=float(
                                                 aen.exact_energy([1.3])[0]))
    exact._exact_cached.cache_clear()
    e_scan = exact.exact_electronic_energy(1.3, "1ssg")
    assert abs(e_guided - e_scan) < 1e-11
