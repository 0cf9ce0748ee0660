"""Wavefunction and gate probes: grids, axis cuts, normalised variants.

Rebuilds reference ``psi3d`` / ``psiX`` / ``psi3d_norm`` / ``psiX_norm``
(poc/main.py:530-635) and ``returnGate`` (poc/main.py:164-176) as pure
functions. Grid evaluation streams x-slabs under ``lax.map`` so large grids
never materialise more than one slab of intermediate activations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import ansatz
from ..ops import quadrature


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _psi_grid(params, cfg: Config, ri, n: int):
    dom = cfg.domain
    dtype = jnp.result_type(*jax.tree.leaves(params))
    ax = jnp.linspace(-dom.box, dom.box, n, dtype=dtype)
    yg, zg = jnp.meshgrid(ax, ax, indexing="ij")
    yf, zf = yg.ravel(), zg.ravel()

    def slab(xi):
        xs = jnp.full_like(yf, xi)
        rs = jnp.full_like(yf, ri)
        psi, _ = ansatz.psi(params, cfg.model, xs, yf, zf, rs)
        psi_l = ansatz.lcao(cfg.model, xs, yf, zf, rs)
        return psi.reshape(n, n), psi_l.reshape(n, n)

    psi, psi_l = jax.lax.map(slab, ax)
    return ax, psi, psi_l


def psi3d(params, cfg: Config, ri: float, n: int | None = None):
    """(x_axis, psi[n,n,n], psi_lcao[n,n,n]) at half-distance ri
    (reference poc/main.py:530-557). Index order [x, y, z]."""
    n = n or cfg.train.n_test
    ax, psi, psi_l = _psi_grid(params, cfg, float(ri), n)
    return np.asarray(ax), np.asarray(psi), np.asarray(psi_l)


def psi_cut_x(params, cfg: Config, ri: float, n: int | None = None):
    """psi and LCAO along the molecular (x) axis at y=z=axis[n//2]
    (reference ``psiX``, poc/main.py:560-567 — the cut goes through the
    grid's central sample, not exactly through 0 for even n)."""
    n = n or cfg.train.n_test
    ax, psi, psi_l = psi3d(params, cfg, ri, n)
    c = n // 2
    return ax, psi[:, c, c], psi_l[:, c, c]


def normalization(params, cfg: Config, ri: float, n: int | None = None,
                  scheme: str = "avg"):
    """(1/sqrt(<psi|psi>), 1/sqrt(<lcao|lcao>)) on the quadrature grid
    (reference poc/main.py:594-595)."""
    n = n or cfg.train.n_test
    ax, psi, psi_l = psi3d(params, cfg, ri, n)
    dx = 2.0 * cfg.domain.box / (n - 1)
    w = quadrature.simpson_weights(n, dx, scheme)
    den = quadrature.integrate_3d(jnp.asarray(psi) ** 2, w, w, w)
    den_l = quadrature.integrate_3d(jnp.asarray(psi_l) ** 2, w, w, w)
    return float(den) ** -0.5, float(den_l) ** -0.5


def psi3d_norm(params, cfg: Config, ri: float, n: int | None = None,
               dense_n: int | None = None, scheme: str = "avg"):
    """Normalised psi/LCAO grids; optionally evaluate on a denser grid while
    normalising on the standard one (reference ``psi3d_norm``,
    poc/main.py:570-625)."""
    npsi, nlcao = normalization(params, cfg, ri, n, scheme)
    ax, psi, psi_l = psi3d(params, cfg, ri, dense_n or n)
    return ax, psi * npsi, psi_l * nlcao


def psi_cut_x_norm(params, cfg: Config, ri: float, n: int | None = None,
                   dense_n: int | None = None):
    """Normalised axis cut (reference ``psiX_norm``, poc/main.py:628-635)."""
    ax, psi, psi_l = psi3d_norm(params, cfg, ri, n, dense_n)
    c = len(ax) // 2
    return ax, psi[:, c, c], psi_l[:, c, c]


def gate_curve(params, cfg: Config, n: int = 1000):
    """The gate ("network importance") f(R) over the R range
    (reference ``returnGate``, poc/main.py:164-176)."""
    r = np.linspace(cfg.domain.r_lo, cfg.domain.r_hi, n)
    return r, np.asarray(ansatz.gate(params, jnp.asarray(r)))


def importance_curve(params, cfg: Config, n: int = 1000):
    """(r, curve, label): the model's R-dependent mixing diagnostic.

    Gated models: the gate f(R) (reference parity). The separable arch has
    no gate — its analog is the Guillemin-Zener second exponent b(R), which
    measures how far psi departs from plain LCAO (b = 0)."""
    r = np.linspace(cfg.domain.r_lo, cfg.domain.r_hi, n)
    rj = jnp.asarray(r)
    if "gate1" in params:
        return r, np.asarray(ansatz.gate(params, rj)), "gate f(R)"
    a = ansatz.orbital_exponent(params, rj)
    b = ansatz.gz_exponent(params, rj, cfg.model.inversion_symmetry, a)
    return r, np.asarray(b), "GZ exponent b(R)"


def energy_curve(params, cfg: Config, n: int = 1000, total: bool = False):
    """E(R) from the eigenvalue head over the R range (reference
    ``energy.py:25-35``). ``total`` adds the 1/(2R) nuclear repulsion."""
    r = np.linspace(cfg.domain.r_lo, cfg.domain.r_hi, n)
    e = np.asarray(ansatz.energy(params, jnp.asarray(r)))
    if total:
        e = e + 1.0 / (2.0 * r)
    return r, e
