"""Forward-Laplacian propagation: exact Laplacians in ONE fused forward pass.

The reference computes the Laplacian of psi with six chained
``torch.autograd.grad(create_graph=True)`` calls per step (reference
``poc/main.py:82-97``, ``train.py:8-10``), which builds and re-traverses
higher-order graphs every epoch. On TPU we instead propagate the triple

    (value v, spatial gradient g, laplacian l)

through every layer in closed form (the "forward Laplacian" scheme of
Li et al., arXiv:2307.08214). One pass over the network yields psi, grad(psi)
and lap(psi) simultaneously; XLA fuses the whole thing into a handful of
VPU/MXU ops with no autodiff graph re-materialisation. This is the single
biggest idiomatic win of the rebuild — the nested-AD path is kept in
``ops/operators.py`` purely as a correctness oracle for tests.

Shapes (batch-first, d = feature width):
    v: (..., d)     values
    g: (..., 3, d)  d/dx, d/dy, d/dz stacked on axis -2
    l: (..., d)     laplacian (trace of the spatial Hessian)

All rules are the standard calculus identities:
    linear:       v' = vW + b,   g' = gW,          l' = lW
    elementwise:  v' = f(v),     g' = f'(v) g,     l' = f'(v) l + f''(v) * sum_i g_i^2
    product:      lap(ab) = a lap(b) + b lap(a) + 2 grad(a).grad(b)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Spatial(NamedTuple):
    """A value together with its spatial gradient and laplacian."""

    v: jax.Array  # (..., d)
    g: jax.Array  # (..., 3, d)
    l: jax.Array  # (..., d)


def const(v: jax.Array) -> Spatial:
    """Lift a spatially-constant array (e.g. a function of R only)."""
    z = jnp.zeros_like(v)
    g = jnp.zeros(v.shape[:-1] + (3,) + v.shape[-1:], v.dtype)
    return Spatial(v, g, z)


def linear(s: Spatial, w: jax.Array, b: jax.Array | None = None) -> Spatial:
    """Affine layer y = s @ w (+ b);  w: (d_in, d_out)."""
    v = s.v @ w
    if b is not None:
        v = v + b
    return Spatial(v, s.g @ w, s.l @ w)


def _elementwise(s: Spatial, f, f1, f2) -> Spatial:
    """Apply scalar f with first/second derivatives f1, f2 elementwise."""
    fv = f(s.v)
    d1 = f1(s.v)
    d2 = f2(s.v)
    g = d1[..., None, :] * s.g
    gsq = jnp.sum(s.g * s.g, axis=-2)  # sum_i (d s / d x_i)^2
    return Spatial(fv, g, d1 * s.l + d2 * gsq)


def sigmoid(s: Spatial) -> Spatial:
    sg = jax.nn.sigmoid(s.v)
    d1 = sg * (1.0 - sg)
    d2 = d1 * (1.0 - 2.0 * sg)
    g = d1[..., None, :] * s.g
    gsq = jnp.sum(s.g * s.g, axis=-2)
    return Spatial(sg, g, d1 * s.l + d2 * gsq)


def tanh(s: Spatial) -> Spatial:
    t = jnp.tanh(s.v)
    d1 = 1.0 - t * t
    d2 = -2.0 * t * d1
    g = d1[..., None, :] * s.g
    gsq = jnp.sum(s.g * s.g, axis=-2)
    return Spatial(t, g, d1 * s.l + d2 * gsq)


def exp(s: Spatial) -> Spatial:
    return _elementwise(s, jnp.exp, jnp.exp, jnp.exp)


def add(a: Spatial, b: Spatial) -> Spatial:
    return Spatial(a.v + b.v, a.g + b.g, a.l + b.l)


def sub(a: Spatial, b: Spatial) -> Spatial:
    return Spatial(a.v - b.v, a.g - b.g, a.l - b.l)


def scale(s: Spatial, c) -> Spatial:
    """Multiply by a spatial constant (scalar or array broadcastable on v)."""
    c = jnp.asarray(c)
    return Spatial(s.v * c, s.g * c[..., None, :] if c.ndim else s.g * c,
                   s.l * c)


def mul(a: Spatial, b: Spatial) -> Spatial:
    """Product rule, including the laplacian cross term."""
    v = a.v * b.v
    g = a.g * b.v[..., None, :] + b.g * a.v[..., None, :]
    cross = 2.0 * jnp.sum(a.g * b.g, axis=-2)
    l = a.l * b.v + b.l * a.v + cross
    return Spatial(v, g, l)


def concat(parts: list[Spatial], axis: int = -1) -> Spatial:
    assert axis == -1
    return Spatial(
        jnp.concatenate([p.v for p in parts], axis=-1),
        jnp.concatenate([p.g for p in parts], axis=-1),
        jnp.concatenate([p.l for p in parts], axis=-1),
    )


def gz_envelope(x: jax.Array, y: jax.Array, z: jax.Array,
                c1, c2, a, b) -> Spatial:
    """Guillemin-Zener two-centre envelope f = exp(-a r1 - b r2) with its
    analytic gradient and laplacian:

        grad f = -f (a u1 + b u2)            (u_i unit vectors from centres)
        lap  f =  f (a^2 + b^2 + 2 a b u1.u2 - 2a/r1 - 2b/r2)

    The classical 2-parameter H2+ trial function (LCAO is b = 0); as the
    physics-baked part of the ansatz it removes most of the bonding-band
    error that the gate*NN(f1,f2)+LCAO family saturates at. a, b may be
    per-point arrays (functions of R).

    c1, c2: (3,)-like centre coordinates (tuples of scalars/arrays).
    """
    d1 = (x - c1[0], y - c1[1], z - c1[2])
    d2 = (x - c2[0], y - c2[1], z - c2[2])
    r1 = jnp.sqrt(d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2)
    r2 = jnp.sqrt(d2[0] ** 2 + d2[1] ** 2 + d2[2] ** 2)
    f = jnp.exp(-a * r1 - b * r2)
    inv1, inv2 = 1.0 / r1, 1.0 / r2
    u1 = jnp.stack(d1, axis=-1) * inv1[..., None]
    u2 = jnp.stack(d2, axis=-1) * inv2[..., None]
    # promote a, b to (...,) arrays for uniform broadcasting
    a_ = jnp.asarray(a) * jnp.ones_like(r1)
    b_ = jnp.asarray(b) * jnp.ones_like(r1)
    g_vec = -(a_[..., None] * u1 + b_[..., None] * u2)
    u1u2 = jnp.sum(u1 * u2, axis=-1)
    lap = f * (a_ ** 2 + b_ ** 2 + 2.0 * a_ * b_ * u1u2
               - 2.0 * a_ * inv1 - 2.0 * b_ * inv2)
    v = f[..., None]
    g = (f[..., None] * g_vec)[..., :, None]
    return Spatial(v, g, lap[..., None])


def radial_seed(x: jax.Array, y: jax.Array, z: jax.Array,
                cx, cy, cz) -> Spatial:
    """Distance r = |p - c| to a centre as a Spatial seed:

        grad r = u = (p - c)/r,   lap r = 2/r.

    The building block for ansatz families expressed in two-centre
    coordinates (e.g. prolate-spheroidal xi, eta are linear combinations of
    r1, r2 — models.ansatz separable arch)."""
    dx, dy, dz = x - cx, y - cy, z - cz
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv_r = 1.0 / r
    u = jnp.stack([dx, dy, dz], axis=-1) * inv_r[..., None]
    return Spatial(r[..., None], u[..., :, None], (2.0 * inv_r)[..., None])


def orbital_envelope(x: jax.Array, y: jax.Array, z: jax.Array,
                     cx, cy, cz, alpha=None) -> Spatial:
    """The 1s atomic-orbital envelope f = exp(-alpha r) centred at
    (cx, cy, cz), seeded with its analytic gradient and laplacian:

        r       = |p - c|
        grad f  = -alpha f * u            (u = (p - c)/r, the unit vector)
        lap  f  =  f * (alpha^2 - 2 alpha / r)

    Mirrors the reference's ``atomicAct_s(toR(...))`` (poc/main.py:64-78,
    269-284; fixed alpha=1 there) but carries derivatives analytically, so
    the nuclear-cusp singularity appears only through the explicit 1/r
    (clamped upstream by the sampler's cutoff, reference poc/main.py:148-149).
    ``alpha`` may be a per-point array (spatially constant, e.g. alpha(R)).

    Inputs are (...,) scalars per point; output feature width is 1.
    """
    dx, dy, dz = x - cx, y - cy, z - cz
    r2 = dx * dx + dy * dy + dz * dz
    r = jnp.sqrt(r2)
    inv_r = 1.0 / r
    if alpha is None:
        f = jnp.exp(-r)
        lap = f * (1.0 - 2.0 * inv_r)
        grad_scale = -f
    else:
        f = jnp.exp(-alpha * r)
        lap = f * (alpha * alpha - 2.0 * alpha * inv_r)
        grad_scale = -alpha * f
    v = f[..., None]
    u = jnp.stack([dx, dy, dz], axis=-1) * inv_r[..., None]  # (..., 3)
    g = (grad_scale[..., None] * u)[..., :, None]            # (..., 3, 1)
    l = lap[..., None]
    return Spatial(v, g, l)


# ---------------------------------------------------------------------------
# 1-D scalar-chain propagation: when a subnetwork's only SPATIAL input is a
# single scalar s (its other inputs constant in space — e.g. the separable
# arch's lam(t; R) and mu(eta^2; R) bodies), carrying the full (v, g, l)
# spatial tuple through every layer wastes 5/3 of the math: it suffices to
# propagate the 1-D derivative triple (f, df/ds, d2f/ds2) and apply the
# spatial chain rule ONCE at the end:
#     grad f = f'(s) grad s,    lap f = f'(s) lap s + f''(s) |grad s|^2.


class Scalar1D(NamedTuple):
    """A value with its first/second derivatives w.r.t. ONE scalar input."""

    v: jax.Array   # (..., d)
    d1: jax.Array  # (..., d)
    d2: jax.Array  # (..., d)


def seed1d(s: jax.Array, consts: list[jax.Array],
           w: jax.Array, b: jax.Array) -> Scalar1D:
    """First affine layer of a scalar-chain body: inputs [s, *consts] where
    only ``s`` is spatially varying (all shaped (..., 1)). The derivative
    seed w.r.t. s is the first weight row."""
    x = jnp.concatenate([s] + list(consts), axis=-1)
    v = x @ w + b
    d1 = jnp.broadcast_to(w[0], v.shape)
    return Scalar1D(v, d1, jnp.zeros_like(v))


def linear1d(t: Scalar1D, w: jax.Array, b: jax.Array | None = None) \
        -> Scalar1D:
    v = t.v @ w
    if b is not None:
        v = v + b
    return Scalar1D(v, t.d1 @ w, t.d2 @ w)


def tanh1d(t: Scalar1D) -> Scalar1D:
    """(tanh o f)'' = tanh''(f) f'^2 + tanh'(f) f''."""
    y = jnp.tanh(t.v)
    g1 = 1.0 - y * y
    g2 = -2.0 * y * g1
    return Scalar1D(y, g1 * t.d1, g1 * t.d2 + g2 * t.d1 * t.d1)


def chain(t: Scalar1D, s: Spatial) -> Spatial:
    """Lift a scalar-chain triple f(s) onto s's spatial tuple (the chain
    rule, applied once for the whole subnetwork). ``s`` has feature width 1;
    the result takes f's width."""
    g = t.d1[..., None, :] * s.g
    gsq = jnp.sum(s.g * s.g, axis=-2)  # (..., 1)
    l = t.d1 * s.l + t.d2 * gsq
    return Spatial(t.v, g, l)
