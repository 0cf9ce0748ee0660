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
from .energy import lcao_fwdlap


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


@functools.partial(jax.jit, static_argnames=("cfg", "n", "scheme"))
def _hf_integral(params, cfg: Config, ri, n: int, scheme: str):
    """(<psi| dV/dR |psi>, <psi|psi>) over the quadrature grid."""
    dom = cfg.domain
    dtype = jnp.result_type(*jax.tree.leaves(params))
    ax = jnp.linspace(-dom.box, dom.box, n, dtype=dtype)
    dx = 2.0 * dom.box / (n - 1)
    w = jnp.asarray(quadrature.simpson_weights(n, dx, scheme), dtype)
    yg, zg = jnp.meshgrid(ax, ax, indexing="ij")
    yf, zf = yg.ravel(), zg.ravel()
    wyz = (w[:, None] * w[None, :]).ravel()

    def slab(xi):
        xs = jnp.full_like(yf, xi)
        rs = jnp.full_like(yf, ri)
        psi, _ = ansatz.psi(params, cfg.model, xs, yf, zf, rs)
        vr = operators.potential_dR(cfg.model, xs, yf, zf, rs)
        return (jnp.sum(wyz * psi * vr * psi), jnp.sum(wyz * psi * psi))

    nums, dens = jax.lax.map(slab, ax)
    return jnp.sum(w * nums), jnp.sum(w * dens)


def denergy_dr_hellmann_feynman(params, cfg: Config, ri: float,
                                n: int | None = None, scheme: str = "avg",
                                total: bool = True) -> float:
    """Hellmann-Feynman dE/dR (reference ``dEdR_int``, poc/main.py:647-676):
    normalised <psi|dV/dR|psi> minus 1/(2R^2) for the nuclear term."""
    n = n or cfg.train.n_test
    num, den = _hf_integral(params, cfg, float(ri), n, scheme)
    de = float(num / den)
    if total:
        de -= 1.0 / (2.0 * ri ** 2)
    return de
