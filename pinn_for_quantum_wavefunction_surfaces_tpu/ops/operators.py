"""Differential operators and the Schrodinger residual.

The production path computes laplacians with the fused forward-Laplacian pass
(:mod:`.fwdlap` + :func:`..models.ansatz.psi_fwdlap`). This module provides:

- the physics functions (two-centre radii, Coulomb potential, Hamiltonian,
  Hellmann-Feynman dH/dR) mirroring reference ``poc/main.py:101-120,639-644``;
- a nested-AD laplacian built from forward-over-reverse (`jvp` over `grad`),
  the idiomatic JAX replacement for the reference's six chained
  ``torch.autograd.grad`` calls (``poc/main.py:82-97``, ``train.py:8-10``).
  It is used as the correctness oracle in tests and for arbitrary functions
  that have no closed-form propagation;
- the PDE residual in both conventions (see ``Config.convention``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import ModelConfig


# ---------------------------------------------------------------------------
# Physics


def radial(mcfg: ModelConfig, x, y, z, r):
    """Distances to the two nuclei at (+/-R, +/-ry, +/-rz)
    (reference poc/main.py:101-108). Inputs/outputs shaped (...,)."""
    r1 = jnp.sqrt((x - r) ** 2 + (y - mcfg.ry) ** 2 + (z - mcfg.rz) ** 2)
    r2 = jnp.sqrt((x + r) ** 2 + (y + mcfg.ry) ** 2 + (z + mcfg.rz) ** 2)
    return r1, r2


def potential(mcfg: ModelConfig, x, y, z, r):
    """Two-centre Coulomb attraction V = -1/r1 - 1/r2 (reference poc/main.py:111-115)."""
    r1, r2 = radial(mcfg, x, y, z, r)
    return -1.0 / r1 - 1.0 / r2


def potential_dR(mcfg: ModelConfig, x, y, z, r):
    """dV/dR at fixed electron position — the Hellmann-Feynman integrand
    (reference poc/main.py:639-644): dV/dR = -(x-R)/r1^3 + (x+R)/r2^3."""
    r1, r2 = radial(mcfg, x, y, z, r)
    return -(x - r) / r1 ** 3 + (x + r) / r2 ** 3


# ---------------------------------------------------------------------------
# Nested-AD laplacian (oracle path)


def laplacian_fn(f: Callable) -> Callable:
    """Given scalar f(xyz) with xyz: (3,), return lap(xyz) via
    forward-over-reverse: three jvp's of grad(f) along the basis vectors.
    Wrap with `jax.vmap` for batches."""
    gradf = jax.grad(f)

    def lap(xyz):
        eye = jnp.eye(3, dtype=xyz.dtype)
        def hvp_diag(e):
            _, tang = jax.jvp(gradf, (xyz,), (e,))
            return jnp.vdot(e, tang)
        return jnp.sum(jax.vmap(hvp_diag)(eye))

    return lap


def grad_and_laplacian_fn(f: Callable) -> Callable:
    """Like :func:`laplacian_fn` but also returns (value, grad)."""
    gradf = jax.grad(f)

    def run(xyz):
        eye = jnp.eye(3, dtype=xyz.dtype)
        g, tangs = jax.vmap(lambda e: jax.jvp(gradf, (xyz,), (e,)))(eye)
        lap = jnp.trace(tangs)
        return f(xyz), g[0], lap

    return run


def hamiltonian_values(mcfg: ModelConfig, x, y, z, r, psi_v, lap_v):
    """H psi = -1/2 lap psi + V psi, given precomputed psi and lap psi
    (reference poc/main.py:118-120)."""
    return -0.5 * lap_v + potential(mcfg, x, y, z, r) * psi_v


# ---------------------------------------------------------------------------
# Residual conventions


def residual_poc(mcfg: ModelConfig, x, y, z, r, psi_v, lap_v, e_v):
    """Canonical residual (H - E) psi in Hartree atomic units
    (reference poc/main.py:345): matches the Wind exact-energy table."""
    return hamiltonian_values(mcfg, x, y, z, r, psi_v, lap_v) - e_v * psi_v


def residual_minimal(mcfg: ModelConfig, x, y, z, r, psi_v, lap_v, e_v):
    """Alternate residual of reference ``train.py:54``:
    lap psi + (e + 1/r1 + 1/r2) psi. No 1/2 on the laplacian and no 2 on the
    potential, so its `e` is NOT the Hartree electronic energy; kept only for
    ``model.bin`` parity with the minimal trainer."""
    r1, r2 = radial(mcfg, x, y, z, r)
    return lap_v + (e_v + 1.0 / r1 + 1.0 / r2) * psi_v


RESIDUALS = {"poc": residual_poc, "minimal": residual_minimal}
