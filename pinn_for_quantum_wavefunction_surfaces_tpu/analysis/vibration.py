"""Nuclear (vibrational/rotational) levels on the electronic surface.

A consumer the reference never built for its E(R) curves: with the
round-3 spline table carrying per-R Rayleigh quotients at ~0.0004 mHa,
the Born-Oppenheimer potential E_tot(D) = E_el(D/2) + 1/D is accurate
enough to predict the H2+ VIBRATIONAL spectrum — the quantity actually
measured in the lab — so the framework can close the loop from PINN
wavefunction to spectroscopy.

The radial nuclear Schroedinger equation at angular momentum J,

    [ -1/(2 mu) d^2/dD^2 + J(J+1)/(2 mu D^2) + E_tot(D) ] chi = E chi,

is solved by a finite-difference tridiagonal eigensolve with Richardson
extrapolation (two grids, h and h/2: the O(h^2) FD error cancels to
O(h^4), giving ~1e-9 Ha at the default resolution — verified against the
analytic harmonic oscillator in tests). mu defaults to m_p/2 (two
protons; the electron mass belongs to the electronic problem in BO).

Everything is plain float64 numpy + one scipy banded eigensolve; no jax.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

# CODATA proton mass in electron masses; the BO nuclear reduced mass of
# H2+ is half of it
PROTON_MASS = 1836.15267343
MU_H2PLUS = PROTON_MASS / 2.0
HARTREE_CM1 = 219474.6313632


def _fd_levels(v_tot: np.ndarray, h: float, mu: float,
               n_levels: int) -> np.ndarray:
    """Lowest eigenvalues of the Dirichlet FD Hamiltonian on a uniform
    grid with potential samples ``v_tot`` (endpoints excluded)."""
    from scipy.linalg import eigh_tridiagonal
    k = 1.0 / (2.0 * mu * h * h)
    diag = 2.0 * k + v_tot
    off = np.full(len(v_tot) - 1, -k)
    return eigh_tridiagonal(diag, off, select="i",
                            select_range=(0, n_levels - 1),
                            eigvals_only=True)


def nuclear_levels(e_tot: Callable[[np.ndarray], np.ndarray],
                   d_lo: float = 0.4, d_hi: float = 8.0,
                   n_levels: int = 4, j: int = 0,
                   mu: float = MU_H2PLUS,
                   n_grid: int = 6000) -> np.ndarray:
    """Lowest ``n_levels`` nuclear levels (Ha, total energy) of the 1-D
    radial problem on ``e_tot``(D) (D = FULL internuclear distance in
    bohr; this repo's R is the half distance — callers convert).

    Richardson extrapolation over grids h and h/2 cancels the O(h^2) FD
    truncation error; the returned levels are O(h^4) accurate. Levels
    approaching e_tot(d_hi) are box-distorted — keep n_levels small
    enough that the classical turning points sit well inside [d_lo, d_hi].
    """
    def solve(n):
        d = np.linspace(d_lo, d_hi, n + 2)[1:-1]
        v = np.asarray(e_tot(d), np.float64)
        if j:
            v = v + j * (j + 1) / (2.0 * mu * d * d)
        return _fd_levels(v, (d_hi - d_lo) / (n + 1), mu, n_levels)

    e_h = solve(n_grid)
    e_h2 = solve(2 * n_grid + 1)   # exactly halves the step
    return (4.0 * e_h2 - e_h) / 3.0


def levels_from_table(table: dict, n_levels: int = 4, j: int = 0,
                      mu: float = MU_H2PLUS,
                      margin: float = 1e-3) -> np.ndarray:
    """Vibrational levels from an exported E(R) spline table (the
    ``e_table`` subtree of an evaluated artifact; analysis.etab). The
    domain is the table's own [R_lo, R_hi] mapped to D = 2R (cubic
    extrapolation beyond the knots is NOT trusted)."""
    from . import etab
    r = np.asarray(table["R"], np.float64)

    def e_tot(d):
        return etab.energy_from_table(table, d / 2.0) + 1.0 / d

    return nuclear_levels(e_tot, d_lo=2.0 * r[0] + margin,
                          d_hi=2.0 * r[-1], n_levels=n_levels, j=j, mu=mu)


def oracle_table(state: str = "1ssg", r_lo: float = 0.2, r_hi: float = 4.0,
                 n_knots: int = 80) -> dict:
    """A {R, E} spline table of the EXACT ODE oracle (log-clustered knots
    like etab.build_table): the exact-BO ruler for the vibrational
    levels. ~1 s per knot."""
    from . import exact
    t = np.linspace(np.log(r_lo + 0.3), np.log(r_hi + 0.3), n_knots)
    r = np.exp(t) - 0.3
    r[0], r[-1] = r_lo, r_hi
    return {"R": r, "E": exact.exact_surface(r, state)}


# Separated-atom principal quantum number per electronic state: the curve
# dissociates to H(n_sep) + p, asymptote E_el -> -1/(2 n_sep^2). Verified
# numerically against the exact oracle at D = 60 (E_el + 1/D matches the
# listed level to < 1 mHa for every state; see tests).
SEPARATED_ATOM_N = {
    "1ssg": 1, "2psu": 1,
    "2ssg": 2, "3dsg": 2, "3psu": 2, "2ppu": 2, "3dpg": 2,
    "3ssg": 3, "3ppu": 3, "3ddg": 3,
    "4fsu": 2, "4fpu": 4, "4psu": 3,
    # n = 4 m > 0 shell (separated-atom limits per the oracle's Stark
    # assignments, analysis/exact.py STATE_INDEX comments)
    "4fdu": 3, "4dpg": 3, "4ddg": 4, "4fpiu": 3, "4ppu": 4,
}


def dissociation_asymptote(state: str = "1ssg") -> float:
    """E_tot(D -> inf) of the electronic surface: the H(n_sep) level."""
    n = SEPARATED_ATOM_N[state]
    return -0.5 / (n * n)


def rovibrational_table(table: dict, state: str, n_v: int = 4,
                        j_max: int = 5, mu: float = MU_H2PLUS) -> dict:
    """The full E(v, J) rovibrational grid on an exported E(R) spline
    table — the user-facing spectroscopy payoff of the surface accuracy
    story (the reference stops at the electronic curve; here the same
    artifact predicts the lines a lab measures).

    Returns a JSON-friendly dict: ``levels_Ha[J][v]`` (total energy, Ha),
    band origins (J = 0 spacings, cm^-1), per-v rotational constants
    B_v = (E(v,1) - E(v,0))/2 (cm^-1, from E ~ E_v + B_v J(J+1)), and the
    D0 against the state's separated-atom asymptote. Keep ``n_v`` small
    enough that every (v, J) level is bound well inside the table domain
    (box-distortion caveat of ``nuclear_levels``)."""
    e = np.stack([levels_from_table(table, n_levels=n_v, j=j, mu=mu)
                  for j in range(j_max + 1)])           # (j_max+1, n_v)
    asym = dissociation_asymptote(state)
    b_v = (e[1] - e[0]) / 2.0 if j_max >= 1 else np.zeros(n_v)
    return {
        "state": state, "mu": mu, "n_v": n_v, "j_max": j_max,
        "asymptote_Ha": asym,
        "levels_Ha": [[round(float(x), 9) for x in row] for row in e],
        "band_origins_cm1": [round(float(d) * HARTREE_CM1, 2)
                             for d in np.diff(e[0])],
        "B_v_cm1": [round(float(b) * HARTREE_CM1, 4) for b in b_v],
        "D0_Ha": round(asym - float(e[0, 0]), 9),
        "D0_eV": round((asym - float(e[0, 0])) * 27.211386246, 5),
    }


def summarize(levels: np.ndarray, asymptote: float = -0.5) -> dict:
    """JSON-friendly summary: levels (Ha), fundamental and spacings in
    cm^-1, and the dissociation energy D0 = asymptote - E0 where
    ``asymptote`` is the separated-atom limit of the surface
    (``dissociation_asymptote(state)``; default H(1s) = -0.5 — correct
    for the ground surface only)."""
    levels = np.asarray(levels, np.float64)
    return {
        "levels_Ha": [round(float(e), 9) for e in levels],
        "spacings_cm1": [round(float(d) * HARTREE_CM1, 2)
                         for d in np.diff(levels)],
        "D0_Ha": round(asymptote - float(levels[0]), 9),
        "D0_eV": round((asymptote - float(levels[0])) * 27.211386246, 5),
    }
