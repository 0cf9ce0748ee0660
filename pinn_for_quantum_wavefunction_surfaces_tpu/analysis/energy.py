"""Eigenvalue-surface extraction: Rayleigh quotients on quadrature grids.

Rebuilds the reference analysis path (``poc/main.py:438-527``):

    E_int(R)  = <psi|H|psi> / <psi|psi>   on an n^3 Simpson grid
    E_net(R)  = the trainable eigenvalue head evaluated at R
    E_lcao(R) = the same quotient for the analytic LCAO ansatz (baseline)

TPU-first differences:
- psi, lap psi come from the fused forward-Laplacian pass (one traversal),
  not 6 chained autograd calls on a 512k-point graph;
- the grid is processed in x-slabs under ``lax.map`` inside one jit, so peak
  memory is O(n^2) — the reference's 250^3 grid that "needs more than 32GB"
  (poc/main.py:1461-1462) streams through in slabs;
- the quadrature contraction runs on-device (ops/quadrature.py) instead of
  host scipy on detached tensors.
"""

from __future__ import annotations

import functools
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import ansatz
from ..ops import operators, quadrature


@functools.partial(jax.jit, static_argnames=("cfg", "n", "scheme", "which"))
def _rayleigh(params, cfg: Config, ri, n: int, scheme: str, which: str):
    """(num, den) of the Rayleigh quotient over the n^3 grid at half-distance
    ri. ``which``: 'model' for the full ansatz, 'lcao' for the baseline."""
    dom = cfg.domain
    dtype = jnp.result_type(*jax.tree.leaves(params))
    ax = jnp.linspace(-dom.box, dom.box, n, dtype=dtype)
    dx = 2.0 * dom.box / (n - 1)
    w = jnp.asarray(quadrature.simpson_weights(n, dx, scheme), dtype)
    yg, zg = jnp.meshgrid(ax, ax, indexing="ij")
    yf, zf = yg.ravel(), zg.ravel()
    wyz = (w[:, None] * w[None, :]).ravel()
    slab = _slab_fn(params, cfg, ri, which, yf, zf, wyz)
    nums, dens = jax.lax.map(slab, ax)
    return jnp.sum(w * nums), jnp.sum(w * dens)


@functools.partial(jax.jit, static_argnames=("cfg", "which"))
def _rayleigh_grid(params, cfg: Config, ri, xg, wx, yg, wy, zg, wz,
                   which: str):
    """Rayleigh-quotient sums on explicit per-axis (nodes, weights) — the
    core for nucleus-adapted grids (see ops.quadrature.adapted_axis)."""
    yy, zz = jnp.meshgrid(yg, zg, indexing="ij")
    yf, zf = yy.ravel(), zz.ravel()
    wyz = (wy[:, None] * wz[None, :]).ravel()
    slab = _slab_fn(params, cfg, ri, which, yf, zf, wyz)
    nums, dens = jax.lax.map(slab, xg)
    return jnp.sum(wx * nums), jnp.sum(wx * dens)


def rayleigh_quotient_adapted(params, cfg: Config, ri: float,
                              n: Optional[int] = None,
                              which: str = "model",
                              strength: float = 0.45,
                              sharpness: float = 2.0) -> float:
    """E_int on a nucleus-adapted grid: x-axis nodes clustered at the two
    nuclei (+-R), y/z axes at the molecular plane. Converges much faster in
    n than the uniform grid for the cusped integrand (see
    tests/test_quadrature.py)."""
    n = n or cfg.train.n_test
    dom = cfg.domain
    dtype = jnp.result_type(*jax.tree.leaves(params))
    xg, wx = quadrature.adapted_axis(n, dom.box, (-ri, ri), strength,
                                     sharpness)
    yg, wy = quadrature.adapted_axis(n, dom.box, (0.0,), strength, sharpness)
    num, den = _rayleigh_grid(params, cfg, jnp.asarray(ri, dtype),
                              jnp.asarray(xg, dtype), jnp.asarray(wx, dtype),
                              jnp.asarray(yg, dtype), jnp.asarray(wy, dtype),
                              jnp.asarray(yg, dtype), jnp.asarray(wy, dtype),
                              which)
    return float(num / den)


def spheroidal_grid(c: float, n_xi: int, n_eta: int,
                    xi_span: float = 20.0):
    """Flattened prolate-spheroidal Gauss grid for focal half-distance c:
    returns (x, rho, w) 1-D arrays such that for any axially-symmetric f,
    sum(w * f(x, rho, 0)) integrates f over R^3.

    xi maps from (-1, 1) to (1, 1 + xi_span/c): covers r1+r2 up to
    2c + 2*xi_span (psi^2 ~ e^{-1.5 r} < 1e-13 there for any alpha >= 0.75).
    THE single source of the training-objective and evaluation grids
    (training/variational.spheroidal_vbatch uses it too — keep them in
    sync by construction)."""
    xi_nodes, xi_w = np.polynomial.legendre.leggauss(n_xi)
    eta_nodes, eta_w = np.polynomial.legendre.leggauss(n_eta)
    half = 0.5 * xi_span / c
    xi = 1.0 + half * (xi_nodes + 1.0)
    wxi = xi_w * half
    xi_g, eta_g = np.meshgrid(xi, eta_nodes, indexing="ij")
    w2d = np.outer(wxi, eta_w) * (xi_g ** 2 - eta_g ** 2) \
        * (2.0 * np.pi * c ** 3)
    x = c * xi_g * eta_g
    rho = c * np.sqrt(np.maximum((xi_g ** 2 - 1.0) * (1.0 - eta_g ** 2),
                                 0.0))
    return x.ravel(), rho.ravel(), w2d.ravel()


def rayleigh_quotient_spheroidal(params, cfg: Config, ri: float,
                                 n_xi: int = 96, n_eta: int = 96,
                                 which: str = "model",
                                 xi_span: float | None = None) -> float:
    """Rayleigh quotient in prolate-spheroidal coordinates — the EXACT
    coordinate system of the two-centre problem.

    With foci at the nuclei (+-R on the x-axis, focal half-distance c = R):
    xi = (r1+r2)/(2c) in [1, inf), eta = (r1-r2)/(2c) in [-1, 1], and the
    sigma-state integrals reduce to

        I = 2 pi c^3  int int  f(xi, eta) (xi^2 - eta^2) dxi deta.

    The cusped integrands of the Cartesian grids become SMOOTH decaying
    exponentials in xi (e^{-a r} = e^{-a c (xi+eta)}), so Gauss-Legendre
    nodes (open — they never hit the nuclei at xi=1, eta=+-1) converge to
    near machine precision with ~10^4 points, where the Cartesian grids need
    512k+ points for ~0.1 mHa. Used for final-word evaluation and
    distillation targets.
    """
    if cfg.model.ry or cfg.model.rz:
        raise NotImplementedError(
            "spheroidal quadrature assumes the nuclei on the x-axis "
            "(sigma symmetry); use the Cartesian grids for ry/rz != 0")
    dtype = jnp.result_type(*jax.tree.leaves(params))
    if xi_span is None:
        xi_span = getattr(cfg.domain, "xi_span", 20.0)
    x, rho, w2d = spheroidal_grid(float(ri), n_xi, n_eta, xi_span)

    xf = jnp.asarray(x, dtype)
    yf = jnp.asarray(rho, dtype)
    zf = jnp.zeros_like(yf)
    rf = jnp.full_like(yf, ri)
    wf = jnp.asarray(w2d, dtype)

    num, den = _spheroidal_sums(params, cfg, xf, yf, zf, rf, wf, which)
    return float(num / den)


@functools.partial(jax.jit, static_argnames=("cfg", "which"))
def _spheroidal_sums(params, cfg: Config, xf, yf, zf, rf, wf, which: str):
    """Module-level jit so the sweep over R reuses one executable."""
    if which == "lcao":
        s = lcao_fwdlap(cfg.model, xf, yf, zf, rf)
    else:
        s, _ = ansatz.psi_fwdlap(params, cfg.model, xf, yf, zf, rf)
    psi = s.v[..., 0]
    hpsi = operators.hamiltonian_values(cfg.model, xf, yf, zf, rf, psi,
                                        s.l[..., 0])
    return jnp.sum(wf * psi * hpsi), jnp.sum(wf * psi * psi)


def _slab_fn(params, cfg: Config, ri, which: str, yf, zf, wyz):
    """Per-x-slab weighted partial sums of (psi H psi, psi^2)."""
    def slab(xi):
        xs = jnp.full_like(yf, xi)
        rs = jnp.full_like(yf, ri)
        if which == "lcao":
            s = lcao_fwdlap(cfg.model, xs, yf, zf, rs)
        else:
            s, _ = ansatz.psi_fwdlap(params, cfg.model, xs, yf, zf, rs)
        psi = s.v[..., 0]
        hpsi = operators.hamiltonian_values(cfg.model, xs, yf, zf, rs, psi,
                                            s.l[..., 0])
        return (jnp.sum(wyz * psi * hpsi), jnp.sum(wyz * psi * psi))
    return slab


def rayleigh_quotient_sharded(params, cfg: Config, ri: float, mesh,
                              n: Optional[int] = None, scheme: str = "avg",
                              which: str = "model", grid: str = "uniform",
                              axis: str = "data") -> float:
    """Mesh-sharded Rayleigh quotient: the grid's x-axis is split across
    devices (shard_map), each device streams its slab subset, and the
    weighted partial sums are ``psum``-reduced over ICI. This is the
    scale-out path for the dense grids that OOM'd the reference at 250^3
    (poc/main.py:1461-1462) — per-device memory is O(n^2 / 1) and the grid
    axis can grow with the mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = n or cfg.train.n_test
    dom = cfg.domain
    dtype = jnp.result_type(*jax.tree.leaves(params))
    n_dev = mesh.shape[axis]
    n_pad = -(-n // n_dev) * n_dev

    if grid == "adapted":
        ax_np, w_np = quadrature.adapted_axis(n, dom.box, (-ri, ri))
        ax_yz, w_yz = quadrature.adapted_axis(n, dom.box, (0.0,))
    else:
        ax_np = np.linspace(-dom.box, dom.box, n)
        dx = 2.0 * dom.box / (n - 1)
        w_np = quadrature.simpson_weights(n, dx, scheme)
        ax_yz, w_yz = ax_np, w_np
    ax_p = jnp.asarray(np.pad(ax_np, (0, n_pad - n), mode="edge"), dtype)
    w_p = jnp.asarray(np.pad(w_np, (0, n_pad - n)), dtype)  # zero-weight pad

    ax1 = jnp.asarray(ax_yz, dtype)
    w1 = jnp.asarray(w_yz, dtype)
    yg, zg = jnp.meshgrid(ax1, ax1, indexing="ij")
    yf, zf = yg.ravel(), zg.ravel()
    wyz = (w1[:, None] * w1[None, :]).ravel()
    slab = _slab_fn(params, cfg, jnp.asarray(ri, dtype), which, yf, zf, wyz)

    @jax.jit
    def run(ax_l, w_l):
        def per_device(ax_d, w_d):
            nums, dens = jax.lax.map(slab, ax_d)
            return (jax.lax.psum(jnp.sum(w_d * nums), axis),
                    jax.lax.psum(jnp.sum(w_d * dens), axis))
        return shard_map(per_device, mesh=mesh,
                         in_specs=(P(axis), P(axis)),
                         out_specs=(P(), P()))(ax_l, w_l)

    num, den = run(ax_p, w_p)
    return float(num / den)


def lcao_fwdlap(mcfg, x, y, z, r):
    """LCAO psi with analytic gradient/laplacian (for the baseline quotient)."""
    from ..ops import fwdlap
    f1 = fwdlap.orbital_envelope(x, y, z, r, mcfg.ry, mcfg.rz)
    f2 = fwdlap.orbital_envelope(x, y, z, -r, -mcfg.ry, -mcfg.rz)
    return fwdlap.add(f1, fwdlap.scale(f2, jnp.asarray(
        float(mcfg.inversion_symmetry), f2.v.dtype)))


def rayleigh_quotient(params, cfg: Config, ri: float, n: Optional[int] = None,
                      scheme: str = "avg", which: str = "model") -> float:
    """E_int = <psi|H|psi>/<psi|psi> at half-distance ri
    (reference ``energy_from_psi``, poc/main.py:438-464)."""
    n = n or cfg.train.n_test
    num, den = _rayleigh(params, cfg, ri, n, scheme, which)
    return float(num / den)


def energy_net(params, ri) -> float:
    """E_net: the eigenvalue head at R=ri (reference E[-1], poc/main.py:463)."""
    return float(ansatz.energy(params, jnp.asarray([ri]))[0])


def surface(params, cfg: Config, r_values=None, n: int = 80,
            scheme: str = "avg", lcao: bool = True,
            grid: str = "uniform", progress=None) -> dict:
    """Sweep R and return the eigenvalue surface in the reference's artifact
    schema {R, E_int, Elcao, E_net} (reference ``calculate_E_R``,
    poc/main.py:495-517). ``grid``: "uniform" (reference parity) or
    "adapted" (nucleus-clustered nodes — far better converged, see
    ops.quadrature.adapted_axis)."""
    dom = cfg.domain
    if r_values is None:
        r_values = np.round(np.arange(dom.r_lo, dom.r_hi + 0.1, 0.1), 2)
    r_values = np.asarray(r_values)
    e_int = np.zeros(len(r_values))
    e_net = np.zeros(len(r_values))
    e_lcao = np.zeros(len(r_values))

    def quotient(ri, which):
        if grid == "spheroidal":
            return rayleigh_quotient_spheroidal(params, cfg, float(ri),
                                                which=which)
        if grid == "adapted":
            # the united-atom orbital tightens like 1/alpha(R) at small R —
            # raise the axis resolution there (verified: n=80 leaves ~15 mHa
            # of pure quadrature error at R=0.2 and ~1.4 mHa at R=1.0;
            # doubling brings both under ~1 mHa)
            n_eff = n * 2 if ri < 1.6 else n
            return rayleigh_quotient_adapted(params, cfg, float(ri), n=n_eff,
                                             which=which)
        num, den = _rayleigh(params, cfg, float(ri), n, scheme, which)
        return float(num / den)

    for i, ri in enumerate(r_values):
        e_int[i] = quotient(ri, "model")
        if lcao:
            e_lcao[i] = quotient(ri, "lcao")
        e_net[i] = energy_net(params, float(ri))
        if progress is not None:
            progress(i, len(r_values), ri)
    return {"R": r_values, "E_int": e_int, "Elcao": e_lcao, "E_net": e_net}


def save_surface(path: str, surf: dict) -> None:
    """Persist in the reference's pickle schema (poc/main.py:509-517)."""
    with open(path, "wb") as f:
        pickle.dump(surf, f)


def load_surface(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


# Exact H2+ energies: H. Wind, J. Chem. Phys. 42, 2371 (1965), as tabulated in
# reference poc/main.py:48-61. R here is the HALF internuclear distance, step
# 0.1 from 0.2 to 4.0; energies are electronic (add 1/(2R) for total).
WIND_R = np.round(np.arange(0.2, 4.1, 0.1), 2)
WIND_E = np.array([
    -1.8008, -1.6715, -1.5545, -1.4518, -1.3623, -1.2843, -1.2159, -1.1558,
    -1.1026, -1.0554, -1.0132, -0.9754, -0.9415, -0.9109, -0.8832, -0.8582,
    -0.8355, -0.8149, -0.7961, -0.7790, -0.7634, -0.7492, -0.7363, -0.7244,
    -0.7136, -0.7037, -0.6946, -0.6863, -0.6786, -0.6716, -0.6651, -0.6591,
    -0.6536, -0.6485, -0.6437, -0.6392, -0.6351, -0.6312, -0.6276,
])


def exact_energy(r_values, oracle: str = "wind") -> np.ndarray:
    """Exact electronic E(R) at the given half-distances.

    ``oracle="wind"``: interpolate the 4-decimal Wind table (the reference's
    ruler — +-0.05 mHa rounding). ``oracle="ode"``: solve the separated
    prolate-spheroidal problem to ~1e-11 Ha (analysis/exact.py) — the ruler
    for sub-0.1 mHa claims; the Wind interpolant seeds each bracket.
    """
    r = np.asarray(r_values, np.float64)
    wind = np.interp(r, WIND_R, WIND_E)
    if oracle == "wind":
        return wind
    if oracle != "ode":
        raise ValueError(f"unknown oracle {oracle!r}")
    from .exact import exact_surface
    in_table = (r >= WIND_R[0]) & (r <= WIND_R[-1])
    return exact_surface(r, "1ssg",
                         guesses=np.where(in_table, wind, np.nan))


def exact_energy_ode(r_values, state: str = "1ssg") -> np.ndarray:
    """Sub-microhartree exact E_el(R) (incl. the ungerade 2p sigma_u state,
    which the Wind table does not cover)."""
    from .exact import exact_surface
    r = np.asarray(r_values, np.float64)
    if state == "1ssg":
        return exact_energy(r, oracle="ode")
    return exact_surface(r, state)
