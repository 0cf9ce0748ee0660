"""Collocation sampling for the 4-D (x, y, z, R) training domain.

TPU-first rewrite of reference ``poc/main.py:124-156`` / ``train.py:26-39``:
- JAX threaded PRNG keys instead of stateful ``torch.rand`` — resampling inside
  a jitted ``lax.scan`` step is pure;
- the boundary sets (points with r >= BCcutoff) become fixed-shape boolean
  MASKS with (sum, count) reductions instead of ``torch.where`` index tensors —
  shapes stay static under `jit` and the masked means shard correctly across a
  device mesh (a mean-of-per-shard-means would be wrong when shard boundary
  counts differ).

Semantics preserved exactly (reference poc/main.py:148-149, train.py:34-37):
points that land within ``cutoff`` of either nucleus get their **x coordinate**
set to ``cutoff``, then radii are recomputed before building boundary masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from .operators import radial


class Batch(NamedTuple):
    """A fixed-shape collocation batch; all fields (n,)-shaped except masks."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    r: jax.Array        # half internuclear distance per point
    bc1: jax.Array      # bool: r1 >= bc_cutoff (boundary-decay set 1)
    bc2: jax.Array      # bool: r2 >= bc_cutoff


def sample_batch(key: jax.Array, cfg: Config, n: int | None = None,
                 dtype=None) -> Batch:
    """Draw n collocation points with the singularity clamp applied.

    ``domain.sampler == "mixed"`` replaces part of the uniform cloud with
    exponential shells centred on the nuclei — the TPU build's importance
    sampler (the reference only ever samples uniformly, leaving ~99% of
    points where psi ~ 0)."""
    dom, mcfg = cfg.domain, cfg.model
    n = cfg.train.n_train if n is None else n
    dtype = jnp.dtype(cfg.dtype) if dtype is None else jnp.dtype(dtype)
    kx, ky, kz, kr, kf = jax.random.split(key, 5)
    b = dom.box
    x = jax.random.uniform(kx, (n,), dtype, -b, b)
    y = jax.random.uniform(ky, (n,), dtype, -b, b)
    z = jax.random.uniform(kz, (n,), dtype, -b, b)
    if dom.fixed_r is not None:
        r = jnp.full((n,), dom.fixed_r, dtype)
    else:
        r = jax.random.uniform(kr, (n,), dtype, dom.r_lo, dom.r_hi)
    if dom.sampler == "mixed":
        n_f = int(dom.focus_frac * n)
        kd, kr_, ks = jax.random.split(kf, 3)
        # isotropic exponential shell: radius ~ Gamma(3, scale) so the
        # RADIAL DENSITY matches e^{-r/scale} in 3-D volume measure
        u = (dom.focus_floor
             + jax.random.gamma(kr_, 3.0, (n_f,), dtype) * dom.focus_scale)
        d = jax.random.normal(kd, (n_f, 3), dtype)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, (n_f,)), 1.0, -1.0)
        cx = sign * r[:n_f]
        cy = sign * mcfg.ry
        cz = sign * mcfg.rz
        xf = jnp.clip(cx + u * d[:, 0], -b, b)
        yf = jnp.clip(cy + u * d[:, 1], -b, b)
        zf = jnp.clip(cz + u * d[:, 2], -b, b)
        x = jnp.concatenate([xf, x[n_f:]])
        y = jnp.concatenate([yf, y[n_f:]])
        z = jnp.concatenate([zf, z[n_f:]])
    # Nuclear-singularity clamp: move x to `cutoff` where either radius is
    # inside the cutoff ball, then recompute radii (poc/main.py:147-149).
    r1, r2 = radial(mcfg, x, y, z, r)
    x = jnp.where((r1 < dom.cutoff) | (r2 < dom.cutoff),
                  jnp.asarray(dom.cutoff, dtype), x)
    r1, r2 = radial(mcfg, x, y, z, r)
    return Batch(x, y, z, r, r1 >= dom.bc_cutoff, r2 >= dom.bc_cutoff)


def sample_batch_at_r(key: jax.Array, cfg: Config, r_value,
                      n: int | None = None, dtype=None) -> Batch:
    """Like :func:`sample_batch` but with the half-distance pinned to a traced
    value (scalar or (n,) array) — used by the per-R sweep where R is a
    runtime quantity, not config. Clamp and masks use the pinned R."""
    dom, mcfg = cfg.domain, cfg.model
    n = cfg.train.n_train if n is None else n
    dtype = jnp.dtype(cfg.dtype) if dtype is None else jnp.dtype(dtype)
    kx, ky, kz = jax.random.split(key, 3)
    b = dom.box
    x = jax.random.uniform(kx, (n,), dtype, -b, b)
    y = jax.random.uniform(ky, (n,), dtype, -b, b)
    z = jax.random.uniform(kz, (n,), dtype, -b, b)
    r = jnp.broadcast_to(jnp.asarray(r_value, dtype), (n,))
    r1, r2 = radial(mcfg, x, y, z, r)
    x = jnp.where((r1 < dom.cutoff) | (r2 < dom.cutoff),
                  jnp.asarray(dom.cutoff, dtype), x)
    r1, r2 = radial(mcfg, x, y, z, r)
    return Batch(x, y, z, r, r1 >= dom.bc_cutoff, r2 >= dom.bc_cutoff)


def sample_importance(key: jax.Array, cfg: Config, r_value,
                      n: int, dtype=None, scale=None,
                      antithetic: bool = False):
    """Importance sample for Rayleigh-quotient (variational) estimation at a
    single half-distance R: a mixture of a uniform-in-box component and
    exponential shells around the two nuclei, WITH the exact mixture density
    so integrals are reweighted consistently (unlike the training sampler,
    whose measure is implicit).

    Returns (x, y, z, w) with w = 1/q(p): unnormalised quadrature weights
    such that sum(w * f) / n estimates the integral of f over R^3.

    Radial proposal per shell: u = floor + Gamma(3, scale); its 3-D density
    is pdf_u(u) / (4 pi u^2). Mixture: q = (1-ff) 1[box]/V + ff * mean of the
    two shells. Shell samples may land outside the box (the quotient is an
    R^3 integral; psi decays there anyway).
    """
    dom, mcfg = cfg.domain, cfg.model
    dtype = jnp.dtype(cfg.dtype) if dtype is None else jnp.dtype(dtype)
    ff = dom.focus_frac
    if scale is None:
        # orbital size shrinks toward the united atom (alpha -> ~2); match
        # the proposal to the expected 1/alpha(R) so small-R estimates don't
        # blow up in variance
        scale = dom.focus_scale / (1.0 + 0.8 * jnp.exp(
            -2.0 * jnp.asarray(r_value, dtype)))
    # No radius floor here (unlike the residual-training sampler): the
    # Gamma(3) shell has a FINITE 3-D density everywhere — a floor would
    # punch a density hole at the nucleus exactly where psi^2 peaks, making
    # the 1/q weights blow up.
    floor = 0.0
    n_f = int(ff * n)
    kx, ky, kz, kd, kr_, ks = jax.random.split(key, 6)
    b = dom.box
    vol = (2.0 * b) ** 3
    r = jnp.broadcast_to(jnp.asarray(r_value, dtype), (n,))

    # uniform component
    x = jax.random.uniform(kx, (n,), dtype, -b, b)
    y = jax.random.uniform(ky, (n,), dtype, -b, b)
    z = jax.random.uniform(kz, (n,), dtype, -b, b)
    # shell component overwrites the first n_f points
    if antithetic:
        # radial antithetic pairs: u = scale * Gamma(3) written as the sum
        # of three exponentials -ln(v_i); the partner uses -ln(1 - v_i)
        # (same Gamma(3, scale) marginal, negatively correlated radius) and
        # SHARES direction and nucleus. NOTE inversion pairing would be
        # useless here: the symmetrised ansatz makes psi^2 and psi H psi
        # exactly inversion-even, so (-p) duplicates the sample. Radial
        # pairing measured ~30% variance reduction on the quotient.
        m = n_f // 2
        n_f = 2 * m
        v = jax.random.uniform(kr_, (m, 3), dtype,
                               jnp.finfo(dtype).tiny, 1.0)
        u = jnp.concatenate([-jnp.log(v).sum(-1),
                             -jnp.log1p(-v).sum(-1)]) * scale + floor
        d = jax.random.normal(kd, (m, 3), dtype)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.concatenate([d, d], axis=0)
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, (m,)), 1.0, -1.0)
        sign = jnp.concatenate([sign, sign])
    else:
        u = floor + jax.random.gamma(kr_, 3.0, (n_f,), dtype) * scale
        d = jax.random.normal(kd, (n_f, 3), dtype)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, (n_f,)), 1.0, -1.0)
    x = x.at[:n_f].set(sign * r[:n_f] + u * d[:, 0])
    y = y.at[:n_f].set(sign * mcfg.ry + u * d[:, 1])
    z = z.at[:n_f].set(sign * mcfg.rz + u * d[:, 2])

    # exact mixture density at every point
    r1, r2 = radial(mcfg, x, y, z, r)

    def shell_density(rr):
        uu = rr - floor
        pdf_u = jnp.where(uu > 0,
                          uu ** 2 * jnp.exp(-uu / scale) / (2.0 * scale ** 3),
                          0.0)
        return pdf_u / (4.0 * jnp.pi * rr ** 2)

    in_box = ((jnp.abs(x) <= b) & (jnp.abs(y) <= b)
              & (jnp.abs(z) <= b)).astype(dtype)
    q = ((1.0 - ff) * in_box / vol
         + ff * 0.5 * (shell_density(r1) + shell_density(r2)))
    w = 1.0 / q
    return x, y, z, w


def linear_axes(cfg: Config, n: int | None = None, dtype=jnp.float64):
    """1-D linearly spaced axes for test/quadrature grids
    (reference ``sampling(..., linearSampling=True)``, poc/main.py:133-140).
    Returns (x_axis, y_axis, z_axis, r_axis)."""
    dom = cfg.domain
    n = cfg.train.n_train if n is None else n
    x = jnp.linspace(-dom.box, dom.box, n, dtype=dtype)
    r = jnp.linspace(dom.r_lo, dom.r_hi, n, dtype=dtype)
    return x, x, x, r


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of ``values`` over ``mask`` with a fixed shape: sum/count, guarded
    against empty masks. Under pjit/global semantics the sums reduce globally,
    which is exactly the single-device answer."""
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, values, 0.0)) / count
