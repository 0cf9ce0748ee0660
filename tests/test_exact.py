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


def test_excited_united_atom_and_interlacing():
    """New excited sigma states (2ssg, 3dsg, 3psu): united-atom limits are
    He+ levels (-Z^2/2n^2 with Z=2: n=2 -> -0.5, n=3 -> -2/9), and the
    radial-root index must interlace within each parity sector."""
    assert abs(exact.exact_electronic_energy(0.01, "2ssg") - (-0.5)) < 2e-3
    assert abs(exact.exact_electronic_energy(0.01, "3psu") - (-2 / 9)) < 2e-4
    assert abs(exact.exact_electronic_energy(0.01, "3dsg") - (-2 / 9)) < 2e-4
    for lo, hi in (("1ssg", "2ssg"), ("2psu", "3psu")):
        for r in (0.2, 1.0, 4.0):
            assert exact.exact_electronic_energy(r, lo) \
                < exact.exact_electronic_energy(r, hi), (lo, hi, r)
    # different ANGULAR branches of the same sigma_g symmetry may cross —
    # and famously do in H2+ (the two-centre separation constant is an
    # extra conserved quantity): 2ssg < 3dsg at chemical distances, but
    # 3dsg dips BELOW 2ssg at large D
    assert exact.exact_electronic_energy(1.0, "2ssg") \
        < exact.exact_electronic_energy(1.0, "3dsg")
    assert exact.exact_electronic_energy(4.0, "3dsg") \
        < exact.exact_electronic_energy(4.0, "2ssg")


def test_excited_states_vs_independent_rayleigh_ritz():
    """Cross-check the excited roots against a generalized-eigenproblem
    Rayleigh-Ritz bound built from an INDEPENDENT method (polynomial x
    exponential basis + spheroidal quadrature + autodiff Laplacian — no
    Jaffe expansion, no continued fraction). Each Ritz eigenvalue must lie
    ABOVE the oracle's root and within a few 1e-4 of it."""
    import jax
    import jax.numpy as jnp

    r_half = 1.0
    x, rho, w = aen.spheroidal_grid(r_half, 48, 48, 25.0)
    x, rho = jnp.asarray(x), jnp.asarray(rho)

    def basis(pt, j, k, parity):
        xx, yy, zz = pt
        r1 = jnp.sqrt((xx - r_half) ** 2 + yy ** 2 + zz ** 2)
        r2 = jnp.sqrt((xx + r_half) ** 2 + yy ** 2 + zz ** 2)
        xi = (r1 + r2) / (2 * r_half)
        eta = (r1 - r2) / (2 * r_half)
        f = xi ** j * jnp.exp(-0.9 * r_half * (xi - 1.0)) * eta ** (2 * k)
        return f * eta if parity < 0 else f

    def column(j, k, parity):
        f = lambda pt: basis(pt, j, k, parity)
        lap = lambda pt: jnp.trace(jax.hessian(f)(pt))
        pts = jnp.stack([x, rho, jnp.zeros_like(x)], -1)
        psi = jax.vmap(f)(pts)
        r1 = jnp.sqrt((x - r_half) ** 2 + rho ** 2)
        r2 = jnp.sqrt((x + r_half) ** 2 + rho ** 2)
        hpsi = -0.5 * jax.vmap(lap)(pts) + (-1 / r1 - 1 / r2) * psi
        return np.asarray(psi), np.asarray(hpsi)

    from scipy.linalg import eigh
    for parity, states in ((1, ("1ssg", "2ssg", "3dsg")),
                           (-1, ("2psu", "3psu"))):
        cols = [column(j, k, parity) for j in range(5) for k in range(4)]
        p = np.stack([c[0] for c in cols])
        hp = np.stack([c[1] for c in cols])
        s_mat = (p * w) @ p.T
        h_mat = (p * w) @ hp.T
        ev = eigh(0.5 * (h_mat + h_mat.T), s_mat, eigvals_only=True)
        for i, st in enumerate(states):
            gap = ev[i] - exact.exact_electronic_energy(r_half, st)
            assert -1e-9 < gap < 5e-4, (st, gap)


def test_pi_delta_united_atom_and_limits():
    """m > 0 sectors (2p pi_u, 3d pi_g, 3d delta_g): united-atom limits are
    He+ levels; the separated-atom limit carries the -1/D monopole of the
    far proton acting on the H(n) electron (E_el ~ -1/(2n^2) - 1/D)."""
    assert abs(exact.exact_electronic_energy(0.01, "2ppu") - (-0.5)) < 2e-4
    assert abs(exact.exact_electronic_energy(0.01, "3dpg") - (-2 / 9)) < 2e-4
    assert abs(exact.exact_electronic_energy(0.01, "3ddg") - (-2 / 9)) < 2e-4
    # literature spot value (Bates & Reid 1968 tabulation lineage):
    # 2p pi_u at D = 2 a0
    assert abs(exact.exact_electronic_energy(1.0, "2ppu")
               - (-0.42877182)) < 1e-7
    for st in ("2ppu", "3dpg"):
        e = exact.exact_electronic_energy(20.0, st)   # D = 40
        assert abs(e - (-0.125 - 1.0 / 40.0)) < 2e-4, (st, e)
    # within the n=2 dissociation manifold the g/u pi pair is nearly
    # degenerate at large D (splitting beyond the monopole term)
    gap = abs(exact.exact_electronic_energy(20.0, "2ppu")
              - exact.exact_electronic_energy(20.0, "3dpg"))
    assert gap < 1e-5


def test_pi_delta_states_vs_independent_rayleigh_ritz():
    """Cross-check the m > 0 roots against a generalized-eigenproblem
    Rayleigh-Ritz bound from an INDEPENDENT method (harmonic-polynomial
    transverse factor x spheroidal basis + autodiff Laplacian — no Jaffe
    expansion, no continued fraction). Each Ritz eigenvalue must lie ABOVE
    the oracle's root and within a few 1e-4 of it."""
    import jax
    import jax.numpy as jnp

    r_half = 1.0
    x, rho, w = aen.spheroidal_grid(r_half, 48, 48, 25.0)
    x, rho = jnp.asarray(x), jnp.asarray(rho)

    def basis(pt, j, k, parity, m):
        xx, yy, zz = pt
        r1 = jnp.sqrt((xx - r_half) ** 2 + yy ** 2 + zz ** 2)
        r2 = jnp.sqrt((xx + r_half) ** 2 + yy ** 2 + zz ** 2)
        xi = (r1 + r2) / (2 * r_half)
        eta = (r1 - r2) / (2 * r_half)
        f = xi ** j * jnp.exp(-0.8 * r_half * (xi - 1.0)) * eta ** (2 * k)
        # Re[(y + i z)^m]: the harmonic transverse factor of an m-state
        trans = yy if m == 1 else yy * yy - zz * zz
        f = f * trans
        return f * eta if parity < 0 else f

    def column(j, k, parity, m):
        f = lambda pt: basis(pt, j, k, parity, m)
        lap = lambda pt: jnp.trace(jax.hessian(f)(pt))
        pts = jnp.stack([x, rho, jnp.zeros_like(x)], -1)
        psi = jax.vmap(f)(pts)
        r1 = jnp.sqrt((x - r_half) ** 2 + rho ** 2)
        r2 = jnp.sqrt((x + r_half) ** 2 + rho ** 2)
        hpsi = -0.5 * jax.vmap(lap)(pts) + (-1 / r1 - 1 / r2) * psi
        return np.asarray(psi), np.asarray(hpsi)

    from scipy.linalg import eigh
    # the phi integral of the transverse factor^2 is a common constant of
    # H and S, so the phi=0 half-plane quadrature ratio is exact
    for m, parity, st in ((1, 1, "2ppu"), (1, -1, "3dpg"), (2, 1, "3ddg")):
        cols = [column(j, k, parity, m) for j in range(5) for k in range(3)]
        p = np.stack([c[0] for c in cols])
        hp = np.stack([c[1] for c in cols])
        s_mat = (p * w) @ p.T
        h_mat = (p * w) @ hp.T
        ev = eigh(0.5 * (h_mat + h_mat.T), s_mat, eigvals_only=True)
        gap = ev[0] - exact.exact_electronic_energy(r_half, st)
        assert -1e-9 < gap < 5e-4, (st, gap)


def test_n3_completion_states_3ssg_3ppu():
    """The two states completing the united-atom n<=3 shell (10 states):
    3ssg = third gerade-sigma radial root, 3ppu = second pi_u radial root.
    United-atom limit He+ n=3 (-2/9); separated-atom limit H(n=3) (-1/18,
    NOT n=2 — both n=2 slots of their sectors are taken by 2ssg/3dsg resp.
    2ppu); interlacing above the lower radial roots of the same branch.
    The D=4 3ssg root sits ~2 mHa from a continued-fraction pole of the
    scalar Jaffe condition — this test also pins the homogeneous
    (pole-free) formulation that finds it."""
    assert abs(exact.exact_electronic_energy(0.01, "3ssg") - (-2 / 9)) < 2e-4
    assert abs(exact.exact_electronic_energy(0.01, "3ppu") - (-2 / 9)) < 2e-4
    # the pole-adjacent root the scalar formulation missed
    e = exact.exact_electronic_energy(2.0, "3ssg")
    assert abs(e - (-0.1509902394)) < 1e-9
    for lo, hi in (("2ssg", "3ssg"), ("2ppu", "3ppu")):
        for r in (0.2, 1.0, 4.0):
            assert exact.exact_electronic_energy(r, lo) \
                < exact.exact_electronic_energy(r, hi), (lo, hi, r)
    # separated-atom: H(n=3) with the far-proton monopole -1/D
    for st in ("3ssg", "3ppu"):
        e = exact.exact_electronic_energy(15.0, st)   # D = 30
        assert abs(e - (-1 / 18 - 1 / 30)) < 1e-2, (st, e)


def test_n3_completion_vs_independent_rayleigh_ritz():
    """3ssg/3ppu against the independent Rayleigh-Ritz bound (same method
    as the other excited-state cross-checks, with one more radial basis
    power to resolve the higher radial roots)."""
    import jax
    import jax.numpy as jnp

    r_half = 1.0
    x, rho, w = aen.spheroidal_grid(r_half, 48, 48, 25.0)
    x, rho = jnp.asarray(x), jnp.asarray(rho)

    def basis(pt, j, k, m):
        xx, yy, zz = pt
        r1 = jnp.sqrt((xx - r_half) ** 2 + yy ** 2 + zz ** 2)
        r2 = jnp.sqrt((xx + r_half) ** 2 + yy ** 2 + zz ** 2)
        xi = (r1 + r2) / (2 * r_half)
        eta = (r1 - r2) / (2 * r_half)
        f = xi ** j * jnp.exp(-0.9 * r_half * (xi - 1.0)) * eta ** (2 * k)
        return f * yy if m else f

    def column(j, k, m):
        f = lambda pt: basis(pt, j, k, m)
        lap = lambda pt: jnp.trace(jax.hessian(f)(pt))
        pts = jnp.stack([x, rho, jnp.zeros_like(x)], -1)
        psi = jax.vmap(f)(pts)
        r1 = jnp.sqrt((x - r_half) ** 2 + rho ** 2)
        r2 = jnp.sqrt((x + r_half) ** 2 + rho ** 2)
        hpsi = -0.5 * jax.vmap(lap)(pts) + (-1 / r1 - 1 / r2) * psi
        return np.asarray(psi), np.asarray(hpsi)

    from scipy.linalg import eigh
    for m, n_k, states, tol in (
            (0, 4, ("1ssg", "2ssg", "3dsg", "3ssg"), 2e-3),
            (1, 3, ("2ppu", "3ppu"), 5e-4)):
        cols = [column(j, k, m) for j in range(6) for k in range(n_k)]
        p = np.stack([c[0] for c in cols])
        hp = np.stack([c[1] for c in cols])
        s_mat = (p * w) @ p.T
        h_mat = (p * w) @ hp.T
        ev = eigh(0.5 * (h_mat + h_mat.T), s_mat, eigvals_only=True)
        gap = ev[len(states) - 1] \
            - exact.exact_electronic_energy(r_half, states[-1])
        assert -1e-9 < gap < tol, (states[-1], gap)


def test_guess_and_scan_paths_agree():
    e_guided = exact.exact_electronic_energy(1.3, "1ssg",
                                             guess=float(
                                                 aen.exact_energy([1.3])[0]))
    exact._exact_cached.cache_clear()
    e_scan = exact.exact_electronic_energy(1.3, "1ssg")
    assert abs(e_guided - e_scan) < 1e-11


def test_n4_stretch_state_4fsu():
    """4f sigma_u — the first n = 4 state (round-4 stretch): the second
    ungerade angular branch (l = 3 at c = 0). Its united-atom He+(4f)
    and separated-atom H(n=2) limits COINCIDE at -1/8, and the large-D
    tail must follow the downhill linear-Stark expansion of the n = 2
    manifold, E ~ -1/8 - 1/D - 3/D^2 (charge-monopole + first Stark
    term) — a sharp, parameter-free asymptotic check. Cross-validated
    against the independent Rayleigh-Ritz bound below (4fsu is ev[3] of
    the ungerade m = 0 spectrum: 4p sigma_u, branch 0 root 2, sits just
    BELOW it at D = 2)."""
    import jax
    import jax.numpy as jnp

    assert abs(exact.exact_electronic_energy(0.01, "4fsu") - (-0.125)) < 2e-4
    e30 = exact.exact_electronic_energy(15.0, "4fsu")   # D = 30
    assert abs(e30 - (-0.125 - 1 / 30.0 - 3 / 900.0)) < 5e-4

    r_half = 1.0
    # the diffuse n = 4 state needs the bigger box (45) for the Ritz
    # bound to stay variationally honest on the quadrature grid
    x, rho, w = aen.spheroidal_grid(r_half, 72, 56, 45.0)
    x, rho = jnp.asarray(x), jnp.asarray(rho)

    def basis(pt, j, k, alpha):
        xx, yy, zz = pt
        r1 = jnp.sqrt((xx - r_half) ** 2 + yy ** 2 + zz ** 2)
        r2 = jnp.sqrt((xx + r_half) ** 2 + yy ** 2 + zz ** 2)
        xi = (r1 + r2) / (2 * r_half)
        eta = (r1 - r2) / (2 * r_half)
        f = xi ** j * jnp.exp(-alpha * r_half * (xi - 1.0)) * eta ** (2 * k)
        return f * eta

    def column(j, k, alpha):
        f = lambda pt: basis(pt, j, k, alpha)
        lap = lambda pt: jnp.trace(jax.hessian(f)(pt))
        pts = jnp.stack([x, rho, jnp.zeros_like(x)], -1)
        psi = jax.vmap(f)(pts)
        r1 = jnp.sqrt((x - r_half) ** 2 + rho ** 2)
        r2 = jnp.sqrt((x + r_half) ** 2 + rho ** 2)
        hpsi = -0.5 * jax.vmap(lap)(pts) + (-1 / r1 - 1 / r2) * psi
        return np.asarray(psi), np.asarray(hpsi)

    from scipy.linalg import eigh
    # two exponents: 0.9 anchors the compact 2psu/3psu, 0.35 the diffuse
    # n = 4 pair — one exponent cannot resolve ev[2]/ev[3] (11 mHa apart)
    cols = [column(j, k, a) for a in (0.35, 0.9)
            for j in range(5) for k in range(4)]
    p = np.stack([c[0] for c in cols])
    hp = np.stack([c[1] for c in cols])
    s_mat = (p * w) @ p.T
    h_mat = (p * w) @ hp.T
    ev = eigh(0.5 * (h_mat + h_mat.T), s_mat, eigvals_only=True)
    for i, st in ((0, "2psu"), (1, "3psu"), (2, "4psu"), (3, "4fsu")):
        gap = ev[i] - exact.exact_electronic_energy(r_half, st)
        assert -1e-9 < gap < 5e-4, (st, gap)


def test_n4_radial_state_4psu_and_crossing():
    """4p sigma_u (round 5) — third radial state of the first ungerade
    branch (two xi nodes): united-atom He+(4p) = -1/8; separated-atom
    H(n=3) as the UPHILL Stark component, E ~ -1/18 - 1/D + 9/D^2
    (monopole + linear Stark, n(n1-n2) = +6, F = 1/D^2). Its curve
    CROSSES 4fsu's (different angular branch — the separable problem's
    extra integral of motion permits exact same-sector crossings): the
    oracle pins the crossing at R* = 1.9331 (D* = 3.866), 4psu sitting
    10.7 mHa BELOW 4fsu at D = 2 and above it at large D. This crossing
    is why plain k-deflation cannot reach either n = 4 sigma_u state
    across the whole R range (DESIGN.md S12) — the mutual-deflation
    recipe (train 4psu k=2, then 4fsu k=3 incl. 4psu, then re-polish
    4psu k=3 incl. 4fsu) is built on the ordering facts pinned here."""
    assert abs(exact.exact_electronic_energy(0.01, "4psu") - (-0.125)) < 2e-4
    e30 = exact.exact_electronic_energy(30.0, "4psu")   # D = 60
    assert abs(e30 - (-1 / 18.0 - 1 / 60.0 + 9 / 3600.0)) < 5e-4

    gap_d2 = (exact.exact_electronic_energy(1.0, "4fsu")
              - exact.exact_electronic_energy(1.0, "4psu"))
    assert abs(gap_d2 * 1e3 - 10.669) < 0.01    # 4psu below at D = 2

    from scipy.optimize import brentq
    f = lambda r: (exact.exact_electronic_energy(r, "4psu")
                   - exact.exact_electronic_energy(r, "4fsu"))
    assert f(1.9) < 0 < f(1.96)                 # bracket of the crossing
    r_star = brentq(f, 1.9, 1.96, xtol=1e-4)
    assert abs(r_star - 1.93306) < 5e-4


def test_2ssg_3dsg_crossing():
    """The n <= 3 gerade sector has its own same-sector exact crossing
    (round-5 finding, surfaced by the 3dsg-well campaign): 2s sigma_g
    (xi-node branch) and 3d sigma_g (eta-node branch) cross at
    R* = 2.0268 — beyond it 3dsg is the SECOND gerade state (40-77 mHa
    below 2ssg across [2.5, 8], both dissociating to H(n=2) as the
    up/downhill Stark pair). Consequences pinned here: (a) the extended
    -domain 3dsg well needs only k = 1 deflation (against 1ssg); (b) on
    the standard [0.2, 4] domain the k-counting rule already breaks for
    R > R* — the node-family ansatz constraint, not the deflation count,
    is what selects the branch there (the shipped 2ssg artifact stays on
    its branch at R = 3-4 where the plain deflated minimum is 3dsg)."""
    from scipy.optimize import brentq

    f = lambda r: (exact.exact_electronic_energy(r, "3dsg")
                   - exact.exact_electronic_energy(r, "2ssg"))
    assert f(2.0) > 0 > f(2.1)              # bracket of the crossing
    r_star = brentq(f, 2.0, 2.1, xtol=1e-4)
    assert abs(r_star - 2.02676) < 5e-4
    assert f(4.0) < -0.07                   # 3dsg ~77 mHa below at R=4


def test_n4_phi_sector_minimum_4fpu():
    """4f phi_u — the m = 3 sector minimum (the n = 4 analog of
    2ppu/3ddg: lowest in its sector, so trainable without deflation).
    United-atom He+(4f) = -0.125; separated-atom H(n=4) with the
    monopole tail (m = 3 has no linear Stark term: n1 = n2 = 0);
    independent Rayleigh-Ritz upper bound as ev[0] of the m = 3
    spectrum (transverse factor y^3 on the z = 0 half-plane)."""
    import jax
    import jax.numpy as jnp

    assert abs(exact.exact_electronic_energy(0.01, "4fpu") - (-0.125)) < 1e-4
    e60 = exact.exact_electronic_energy(30.0, "4fpu")   # D = 60
    assert abs(e60 - (-0.5 / 16 - 1 / 60.0)) < 5e-4

    r_half = 1.0
    x, rho, w = aen.spheroidal_grid(r_half, 64, 48, 40.0)
    x, rho = jnp.asarray(x), jnp.asarray(rho)

    def basis(pt, j, k):
        xx, yy, zz = pt
        r1 = jnp.sqrt((xx - r_half) ** 2 + yy ** 2 + zz ** 2)
        r2 = jnp.sqrt((xx + r_half) ** 2 + yy ** 2 + zz ** 2)
        xi = (r1 + r2) / (2 * r_half)
        eta = (r1 - r2) / (2 * r_half)
        f = xi ** j * jnp.exp(-0.45 * r_half * (xi - 1.0)) * eta ** (2 * k)
        # the HARMONIC m = 3 factor Re[(y+iz)^3] — plain y^3 would mix in
        # an m = 1 component (sin^3 = (3 sin - sin3)/4) and ev[0] would
        # be the pi-sector minimum instead
        return f * (yy ** 3 - 3.0 * yy * zz ** 2)

    def column(j, k):
        f = lambda pt: basis(pt, j, k)
        lap = lambda pt: jnp.trace(jax.hessian(f)(pt))
        pts = jnp.stack([x, rho, jnp.zeros_like(x)], -1)
        psi = jax.vmap(f)(pts)
        r1 = jnp.sqrt((x - r_half) ** 2 + rho ** 2)
        r2 = jnp.sqrt((x + r_half) ** 2 + rho ** 2)
        hpsi = -0.5 * jax.vmap(lap)(pts) + (-1 / r1 - 1 / r2) * psi
        return np.asarray(psi), np.asarray(hpsi)

    from scipy.linalg import eigh
    cols = [column(j, k) for j in range(5) for k in range(3)]
    p = np.stack([c[0] for c in cols])
    hp = np.stack([c[1] for c in cols])
    s_mat = (p * w) @ p.T
    h_mat = (p * w) @ hp.T
    ev = eigh(0.5 * (h_mat + h_mat.T), s_mat, eigvals_only=True)
    gap = ev[0] - exact.exact_electronic_energy(r_half, "4fpu")
    assert -1e-9 < gap < 5e-4, gap


def test_n4_m_sector_shell():
    """Round-5 widening of the n = 4 shell into the m > 0 sectors:
    4f delta_u (the delta_u sector MINIMUM), 4d pi_g / 4d delta_g (k = 1
    radial states), 4f pi_u (second pi_u ANGULAR branch) and 4p pi_u.
    United-atom limits are He+(n=4) = -1/8 for all five; separated-atom
    limits follow the parabolic mapping n1 = n_xi, n2 = floor(n_eta/2),
    n = n1 + n2 + m + 1 with linear-Stark slope (3/2) n (n1 - n2)
    (reference poc/main.py has no excited spectrum at all — this ladder
    is oracle-only capability on top of it)."""
    for s in ("4fdu", "4dpg", "4ddg", "4fpiu", "4ppu"):
        assert abs(exact.exact_electronic_energy(0.01, s) - (-0.125)) < 5e-5

    d = 60.0
    sep = {
        # (n, n1 - n2): E ~ -1/(2 n^2) - 1/D + 1.5 n (n1-n2) / D^2
        "4fdu": (3, 0),     # H(3d), no linear Stark
        "4dpg": (3, +1),    # H(n=3) uphill
        "4fpiu": (3, -1),   # H(n=3) DOWNHILL (n2 = 1) — see crossing below
        "4ddg": (4, +1),    # H(n=4) uphill
        "4ppu": (4, +2),    # largest slope in the shell
    }
    for s, (n, dq) in sep.items():
        ref = -0.5 / n ** 2 - 1 / d + 1.5 * n * dq / d ** 2
        tol = 2e-4 if abs(dq) < 2 else 6e-4   # O(1/D^3) grows with |dq|
        assert abs(exact.exact_electronic_energy(d / 2, s) - ref) < tol, s


def test_pi_u_ladder_ordering_and_crossing():
    """Deflation-counting facts for the pi_u n = 4 pair (the analog of
    the 4psu/4fsu sigma_u story, with the OPPOSITE resolution): the
    angular-branch state 4f pi_u sits BELOW the radial 4p pi_u at every
    R in the standard box — +0.68 mHa at R = 0.2 growing to +51 mHa at
    R = 4 — so k = 2 deflation against 2ppu + 3ppu reaches 4fpiu
    directly and 4ppu is the FOURTH pi_u state (k = 3). The ladder's
    own exact crossing is 3ppu x 4fpiu at R* = 4.1146, just OUTSIDE the
    default [0.2, 4] domain (both dissociate to H(n=3) as the up/downhill
    Stark pair): in-span counting is safe, extended-domain pi_u runs past
    R* are not."""
    from scipy.optimize import brentq

    gap = lambda r: (exact.exact_electronic_energy(r, "4ppu")
                     - exact.exact_electronic_energy(r, "4fpiu"))
    assert abs(gap(0.2) * 1e3 - 0.675) < 0.02
    assert abs(gap(4.0) * 1e3 - 50.822) < 0.05

    f = lambda r: (exact.exact_electronic_energy(r, "3ppu")
                   - exact.exact_electronic_energy(r, "4fpiu"))
    assert f(4.0) < 0 < f(4.2)              # bracket of the crossing
    r_star = brentq(f, 4.0, 4.2, xtol=1e-4)
    assert abs(r_star - 4.11459) < 5e-4
