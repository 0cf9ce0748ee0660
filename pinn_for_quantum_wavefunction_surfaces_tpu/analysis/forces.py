"""Forces on the nuclei: -dE/dR three independent ways.

Reproduces the reference's force panel (``poc/main.py:639-676,1307-1489``):

1. autograd through the trainable eigenvalue head E(R) — here a one-liner
   ``jax.grad`` instead of torch graph surgery;
2. finite differences of E(R);
3. the Hellmann-Feynman integral  dE/dR = <psi| dV/dR |psi> / <psi|psi>
   minus the nuclear-repulsion derivative 1/(2R^2) (reference ``dEdR_int``).

R is the HALF internuclear distance; the total energy is E + 1/(2R), so the
derivative w.r.t. R of the nuclear term is -1/(2R^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import ansatz
from ..ops import operators, quadrature


def denergy_dr_autograd(params, r_values, total: bool = False) -> np.ndarray:
    """dE/dR by differentiating the eigenvalue head (reference
    poc/main.py:1324-1332). ``total`` adds the nuclear term d(1/(2R))/dR."""
    def e_of_r(ri):
        e = ansatz.energy(params, ri[None])[0]
        return e + (0.5 / ri if total else 0.0)
    g = jax.vmap(jax.grad(e_of_r))(jnp.asarray(r_values))
    return np.asarray(g)


def denergy_dr_fd(params, r_values, eps: float = 1e-4,
                  total: bool = False) -> np.ndarray:
    """Central finite differences of E(R) (reference poc/main.py:1334-1344)."""
    r = jnp.asarray(r_values)
    ep = ansatz.energy(params, r + eps)
    em = ansatz.energy(params, r - eps)
    g = (ep - em) / (2 * eps)
    if total:
        g = g - 0.5 / r ** 2
    return np.asarray(g)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n", "scheme", "regularized"))
def _hf_integral(params, cfg: Config, ri, n: int, scheme: str,
                 regularized: bool):
    """(<psi| dV/dR |psi>, <psi|psi>) over the quadrature grid.

    The raw integrand psi^2 * (x -+ R)/r^3 has 1/r^2 singularities at the
    nuclei and does NOT converge on a uniform grid (the reference's
    ``dEdR_int`` shares this defect — same grid, same integrand). With
    ``regularized`` (default), each nuclear term is tamed by singularity
    subtraction: for any spherically-symmetric s(r) around a nucleus,
    the odd-angular integral  integral s(r) (x-R)/r^3 d^3r  vanishes
    EXACTLY, so subtracting  psi^2(nucleus) * exp(-2r)  changes nothing
    analytically but removes the 1/r^2 blow-up (the residue is O(1/r),
    same class as the Coulomb potential the quadrature already handles).
    """
    dom, mcfg = cfg.domain, cfg.model
    dtype = jnp.result_type(*jax.tree.leaves(params))
    ax = jnp.linspace(-dom.box, dom.box, n, dtype=dtype)
    dx = 2.0 * dom.box / (n - 1)
    w = jnp.asarray(quadrature.simpson_weights(n, dx, scheme), dtype)
    yg, zg = jnp.meshgrid(ax, ax, indexing="ij")
    yf, zf = yg.ravel(), zg.ravel()
    wyz = (w[:, None] * w[None, :]).ravel()

    ri_arr = jnp.asarray([ri], dtype)
    psi_n1, _ = ansatz.psi(params, mcfg, ri_arr, jnp.asarray([mcfg.ry], dtype),
                           jnp.asarray([mcfg.rz], dtype), ri_arr)
    psi_n2, _ = ansatz.psi(params, mcfg, -ri_arr,
                           jnp.asarray([-mcfg.ry], dtype),
                           jnp.asarray([-mcfg.rz], dtype), ri_arr)
    a1 = psi_n1[0] ** 2
    a2 = psi_n2[0] ** 2

    def slab(xi):
        xs = jnp.full_like(yf, xi)
        rs = jnp.full_like(yf, ri)
        psi, _ = ansatz.psi(params, mcfg, xs, yf, zf, rs)
        psi2 = psi * psi
        r1, r2 = operators.radial(mcfg, xs, yf, zf, rs)
        t1 = -(xs - rs) / r1 ** 3
        t2 = (xs + rs) / r2 ** 3
        if regularized:
            num = ((psi2 - a1 * jnp.exp(-2.0 * r1)) * t1
                   + (psi2 - a2 * jnp.exp(-2.0 * r2)) * t2)
        else:
            num = psi2 * (t1 + t2)
        return (jnp.sum(wyz * num), jnp.sum(wyz * psi2))

    nums, dens = jax.lax.map(slab, ax)
    return jnp.sum(w * nums), jnp.sum(w * dens)


def denergy_dr_hf_spheroidal(params, cfg: Config, ri: float,
                             n_xi: int = 128, n_eta: int = 128,
                             total: bool = True,
                             xi_span: float | None = None) -> float:
    """Hellmann-Feynman dE/dR on the prolate-spheroidal Gauss grid.

    The Cartesian HF integrand psi^2 (x -+ R)/r^3 needs singularity
    subtraction and still converges slowly (see ``_hf_integral``); in
    spheroidal coordinates the volume element (xi^2 - eta^2) = r1 r2 / c^2
    cancels a full power of each 1/r and Gauss-Legendre nodes never touch
    the nuclei, so this converges like the energy quadrature.
    """
    if cfg.model.ry or cfg.model.rz:
        raise NotImplementedError("spheroidal HF assumes on-axis nuclei")
    import numpy as _np
    dtype = jnp.result_type(*jax.tree.leaves(params))
    c = float(ri)
    xi_nodes, xi_w = _np.polynomial.legendre.leggauss(n_xi)
    eta_nodes, eta_w = _np.polynomial.legendre.leggauss(n_eta)
    if xi_span is None:
        xi_span = getattr(cfg.domain, "xi_span", 20.0)
    half = 0.5 * xi_span / c
    xi = 1.0 + half * (xi_nodes + 1.0)
    wxi = xi_w * half
    xi_g, eta_g = _np.meshgrid(xi, eta_nodes, indexing="ij")
    w2d = _np.outer(wxi, eta_w) * (xi_g ** 2 - eta_g ** 2) \
        * (2.0 * _np.pi * c ** 3)
    x = c * xi_g * eta_g
    rho = c * _np.sqrt(_np.maximum((xi_g ** 2 - 1.0) * (1.0 - eta_g ** 2),
                                   0.0))
    xf = jnp.asarray(x.ravel(), dtype)
    yf = jnp.asarray(rho.ravel(), dtype)
    zf = jnp.zeros_like(yf)
    rf = jnp.full_like(yf, ri)
    wf = jnp.asarray(w2d.ravel(), dtype)
    psi, _ = ansatz.psi(params, cfg.model, xf, yf, zf, rf)
    # singularity subtraction (same identity as the Cartesian path): for any
    # spherical s(r) around a nucleus the odd-angular integral of
    # s(r)(x-R)/r^3 vanishes exactly, so subtracting psi^2(nucleus) e^{-2r}
    # removes the residual 1/r of each term on this grid too
    ri_arr = jnp.asarray([ri], dtype)
    zero = jnp.zeros_like(ri_arr)
    a1 = ansatz.psi(params, cfg.model, ri_arr, zero, zero, ri_arr)[0][0] ** 2
    a2 = ansatz.psi(params, cfg.model, -ri_arr, zero, zero, ri_arr)[0][0] ** 2
    r1, r2 = operators.radial(cfg.model, xf, yf, zf, rf)
    t1 = -(xf - rf) / r1 ** 3
    t2 = (xf + rf) / r2 ** 3
    psi2 = psi * psi
    num = float(jnp.sum(wf * ((psi2 - a1 * jnp.exp(-2 * r1)) * t1
                              + (psi2 - a2 * jnp.exp(-2 * r2)) * t2)))
    den = float(jnp.sum(wf * psi2))
    de = num / den
    if total:
        de -= 1.0 / (2.0 * ri ** 2)
    return de


def denergy_dr_hellmann_feynman(params, cfg: Config, ri: float,
                                n: int | None = None, scheme: str = "avg",
                                total: bool = True,
                                regularized: bool = True) -> float:
    """Hellmann-Feynman dE/dR (reference ``dEdR_int``, poc/main.py:647-676):
    normalised <psi|dV/dR|psi>, minus 1/(2R^2) for the nuclear term when
    ``total``. ``regularized=False`` reproduces the reference's raw
    (non-convergent) integrand for parity."""
    n = n or cfg.train.n_test
    num, den = _hf_integral(params, cfg, float(ri), n, scheme, regularized)
    de = float(num / den)
    if total:
        de -= 1.0 / (2.0 * ri ** 2)
    return de
