"""Simpson weights vs scipy and closed-form integrals."""

import numpy as np
import pytest

from pinn_for_quantum_wavefunction_surfaces_tpu.ops import quadrature


def test_odd_n_matches_scipy():
    si = pytest.importorskip("scipy.integrate")
    x = np.linspace(0, 3, 81)
    f = np.exp(-x) * np.sin(3 * x) + x ** 2
    w = quadrature.simpson_weights(81, x[1] - x[0])
    np.testing.assert_allclose(w @ f, si.simpson(f, x=x), rtol=1e-12)


def test_even_n_cartwright_matches_modern_scipy():
    si = pytest.importorskip("scipy.integrate")
    x = np.linspace(0, 3, 80)
    f = np.exp(-x) * np.cos(2 * x) + x
    w = quadrature.simpson_weights(80, x[1] - x[0], scheme="cartwright")
    np.testing.assert_allclose(w @ f, si.simpson(f, x=x), rtol=1e-12)


def test_even_n_avg_scheme_consistency():
    """'avg' == mean of (simpson left + trapz last, trapz first + simpson
    right), built independently here."""
    n = 80
    x = np.linspace(-1, 2, n)
    dx = x[1] - x[0]
    f = np.cosh(x) * np.sin(5 * x)

    def simpson_odd(m):
        w = np.ones(m)
        w[1:-1:2], w[2:-1:2] = 4.0, 2.0
        return w * dx / 3

    left = simpson_odd(n - 1) @ f[:-1] + 0.5 * dx * (f[-2] + f[-1])
    right = simpson_odd(n - 1) @ f[1:] + 0.5 * dx * (f[0] + f[1])
    w = quadrature.simpson_weights(n, dx, scheme="avg")
    np.testing.assert_allclose(w @ f, 0.5 * (left + right), rtol=1e-12)


def test_3d_gaussian():
    n = 101
    L = 6.0
    x = np.linspace(-L, L, n)
    w = quadrature.simpson_weights(n, x[1] - x[0])
    xg, yg, zg = np.meshgrid(x, x, x, indexing="ij")
    f = np.exp(-(xg ** 2 + yg ** 2 + zg ** 2))
    got = float(quadrature.integrate_3d(f, w, w, w))
    np.testing.assert_allclose(got, np.pi ** 1.5, rtol=1e-8)


def test_hydrogen_norm():
    """<e^-r | e^-r> = pi (the 1s normalisation integral)."""
    n = 161
    L = 14.0
    x = np.linspace(-L, L, n)
    w = quadrature.simpson_weights(n, x[1] - x[0])
    xg, yg, zg = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(xg ** 2 + yg ** 2 + zg ** 2)
    got = float(quadrature.integrate_3d(np.exp(-2 * r), w, w, w))
    # the cusp at r=0 limits Simpson convergence — 1e-3 relative is the
    # expected accuracy at this resolution
    np.testing.assert_allclose(got, np.pi, rtol=1e-3)
