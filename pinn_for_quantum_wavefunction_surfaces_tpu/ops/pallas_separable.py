"""Pallas TPU training kernel for the SEPARABLE-spheroidal flagship family.

Round-2 shipped the fused custom-VJP training kernel for the symmetric
family (ops/pallas_train.py) just as the flagship moved to the separable
arch (models/ansatz._psi_separable_fwdlap: psi = Phi_GZ x exp(l(xi;R) +
m(eta^2;R)) with two width-16 tanh MLP log-corrections). This module is the
same kernel design applied to that family:

- ONE forward kernel propagates the stacked (v, gx, gy, gz, lap) components
  of the full separable ansatz through closed-form forward-Laplacian rules
  on (SUB, 128) f32 VPU tiles — GZ envelopes, the spheroidal features
  t = e^{-c(xi-1)} and eta^2, both tanh MLPs, the bounded log-correction
  and the final product rule, all in VMEM.
- The R-only heads (E, alpha(R), b(R)) stay in XLA which also autodiffs
  them; the kernel takes per-point (a, b) and returns cotangents for them.
- The BACKWARD kernel recomputes the forward per tile and applies the
  tile-local ``jax.vjp`` (traced at build time), writing per-tile partial
  weight gradients; the cross-tile sum is a cheap XLA reduction. No layer
  activation ever reaches HBM.

Why this family can beat XLA where the symmetric one couldn't (RESULTS.md
round-2 roofline): the separable forward is transcendental-dense (64 tanh +
4 exp + 2 sqrt per point vs the symmetric family's sigmoid chains), and
XLA's backward re-materialises the (n, hidden, 5) activation stacks through
HBM — recompute-in-VMEM buys relatively more here.

Replaces the reference's 6-pass ``autograd.grad`` graph
(``poc/main.py:82-97``) for this family; layer structure mirrors
``models/ansatz.py:350-383`` (the XLA fwdlap path, kept as the oracle).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Separate tile sizes for the two kernels: the backward's tile-local vjp
# holds ~2x the forward's live stacks (16 a1 activations + their transpose
# residuals per MLP). With the full 5-stack MLP propagation, (32, 128)
# overflowed the 16 MB scoped-VMEM limit by ~0.9 MB on v5e; the
# scalar-chain bodies (3/5 the live state) fit up to (48, 128) — measured
# 38.6M pts/s (16, pre-chain) -> 63.8M (32) -> 76.1M (48); (64, 128) OOMs.
_SUB = int(os.environ.get("PALLAS_SEP_SUB", 32))
_SUB_B = int(os.environ.get("PALLAS_SEP_SUB_BWD", 48))
_LANE = 128


# ---------------------------------------------------------------------------
# Stacked (5, S, L) forward-Laplacian algebra (component order
# [v, gx, gy, gz, lap]); every rule is the closed-form identity from
# ops/fwdlap.py specialised to scalar feature width.


def _s_add(a, b):
    return a + b


def _row0(c, shape, dtype, rows=5):
    """Lift a spatially-constant offset into the value row of a stacked
    array WITHOUT a scatter (Mosaic has no scatter-add lowering): concat
    [c, 0, ...] along the leading axis. Its vjp is a slice — cheap."""
    c = jnp.broadcast_to(c, shape).astype(dtype)
    return jnp.concatenate([c[None], jnp.zeros((rows - 1,) + shape, dtype)])


def _s_affine(a, w, c):
    """w * a + c where w is a weight scalar (ONE tensor use — the
    vjp-transpose of a broadcast is a full-tile reduction, see
    pallas_train._envelope) and c a spatially-constant value-row offset."""
    return a * w + _row0(c, a.shape[1:], a.dtype)


def _s_mul(a, b):
    """Product rule including the laplacian cross term."""
    cross = a[1] * b[1] + a[2] * b[2] + a[3] * b[3]
    return jnp.stack([
        a[0] * b[0],
        a[1] * b[0] + b[1] * a[0],
        a[2] * b[0] + b[2] * a[0],
        a[3] * b[0] + b[3] * a[0],
        a[4] * b[0] + b[4] * a[0] + 2.0 * cross,
    ])


def _s_exp(a):
    e = jnp.exp(a[0])
    gsq = a[1] * a[1] + a[2] * a[2] + a[3] * a[3]
    return jnp.stack([e, e * a[1], e * a[2], e * a[3], e * (a[4] + gsq)])


def _s_tanh(a):
    t = jnp.tanh(a[0])
    d1 = 1.0 - t * t
    d2 = -2.0 * t * d1
    gsq = a[1] * a[1] + a[2] * a[2] + a[3] * a[3]
    return jnp.stack([t, d1 * a[1], d1 * a[2], d1 * a[3],
                      d1 * a[4] + d2 * gsq])


def _t_tanh(a):
    """tanh on a 1-D derivative TRIPLE [f, df/ds, d2f/ds2] (the scalar-chain
    representation): (tanh o f)'' = tanh''(f) f'^2 + tanh'(f) f''."""
    t = jnp.tanh(a[0])
    d1 = 1.0 - t * t
    d2 = -2.0 * t * d1
    return jnp.stack([t, d1 * a[1], d1 * a[2] + d2 * a[1] * a[1]])


def _mlp_tanh_scalar(w1, b1, w2, b2, ow, ob, s, cf, hidden):
    """The key structural win over the generic 5-stack propagation: each
    separable MLP sees exactly ONE spatial scalar (t or eta^2; the other
    input 0.25R is spatially constant), so the whole body runs on 1-D
    derivative triples [v, d/ds, d2/ds2] — 3/5 of the math and live VMEM of
    the full (v, gx, gy, gz, lap) stacks, with the spatial chain rule
    applied ONCE by the caller. Still one tensor use per weight scalar (the
    vjp-transpose of a broadcast is a full-tile reduction).

    s: (S, L) scalar feature; cf: (S, L) spatially-constant feature.
    Returns the (3, S, L) triple of the MLP output w.r.t. s."""
    ones = jnp.ones_like(s)
    seed = jnp.stack([s, ones, jnp.zeros_like(s)])
    a1 = [_t_tanh(seed * w1[0, j]
                  + _row0(cf * w1[1, j] + b1[0, j], s.shape, s.dtype,
                          rows=3))
          for j in range(hidden)]
    out = 0.0
    for j in range(hidden):
        lin = a1[0] * w2[0, j]
        for i in range(1, hidden):
            lin = lin + a1[i] * w2[i, j]
        a2 = _t_tanh(lin + _row0(b2[0, j], s.shape, s.dtype, rows=3))
        out = out + a2 * ow[j, 0]
    return out + _row0(ob[0, 0], s.shape, s.dtype, rows=3)


def _chain5(triple, sp):
    """Spatial chain rule, applied once per MLP: lift the 1-D triple
    [f, f', f''] of f(s) onto s's (5, S, L) spatial stack:
        grad f = f'(s) grad s,   lap f = f'(s) lap s + f''(s) |grad s|^2."""
    f, d1, d2 = triple[0], triple[1], triple[2]
    gsq = sp[1] * sp[1] + sp[2] * sp[2] + sp[3] * sp[3]
    return jnp.stack([f, d1 * sp[1], d1 * sp[2], d1 * sp[3],
                      d1 * sp[4] + d2 * gsq])


def _gz_stack(d1x, d1y, d1z, r1, inv1, d2x, d2y, d2z, r2, inv2, a, b):
    """(5, S, L) stack of the Guillemin-Zener envelope exp(-a r1 - b r2)
    (closed forms in ops/fwdlap.gz_envelope)."""
    f = jnp.exp(-a * r1 - b * r2)
    s1 = a * inv1
    s2 = b * inv2
    gx = -f * (s1 * d1x + s2 * d2x)
    gy = -f * (s1 * d1y + s2 * d2y)
    gz = -f * (s1 * d1z + s2 * d2z)
    u1u2 = (d1x * d2x + d1y * d2y + d1z * d2z) * inv1 * inv2
    lap = f * (a * a + b * b + 2.0 * a * b * u1u2
               - 2.0 * a * inv1 - 2.0 * b * inv2)
    return jnp.stack([f, gx, gy, gz, lap])


_LOG_CORR_CAP = 3.0  # models/ansatz.LOG_CORR_CAP (anti quadrature-gaming)


def _core(weights, a, b, x, y, z, r, *, hidden, p_sym, ry, rz):
    """Tile-local (psi, lap) of the separable family; pure jnp on (S, L)
    blocks — traced by the forward kernel AND by jax.vjp in the backward."""
    (l1w, l1b, l2w, l2b, low, lob,
     m1w, m1b, m2w, m2b, mow, mob) = weights
    p = float(p_sym)

    d1x, d1y, d1z = x - r, y - ry, z - rz
    d2x, d2y, d2z = x + r, y + ry, z + rz
    r1 = jnp.sqrt(d1x * d1x + d1y * d1y + d1z * d1z)
    r2 = jnp.sqrt(d2x * d2x + d2y * d2y + d2z * d2z)
    inv1, inv2 = 1.0 / r1, 1.0 / r2

    phi = (_gz_stack(d1x, d1y, d1z, r1, inv1, d2x, d2y, d2z, r2, inv2, a, b)
           + p * _gz_stack(d2x, d2y, d2z, r2, inv2, d1x, d1y, d1z, r1, inv1,
                           a, b))

    # radial stacks r_i: grad = u_i, lap = 2/r_i
    r1s = jnp.stack([r1, d1x * inv1, d1y * inv1, d1z * inv1, 2.0 * inv1])
    r2s = jnp.stack([r2, d2x * inv2, d2y * inv2, d2z * inv2, 2.0 * inv2])
    # t = e^{r - (r1+r2)/2} in (0, 1]
    t = _s_exp(_s_affine((r1s + r2s) * (-0.5), 1.0, r))
    # eta = (r1-r2)/(2r) (spatially-constant scale), eta^2 via product rule
    eta = (r1s - r2s) * (0.5 / r)
    eta2 = _s_mul(eta, eta)
    r_feat = 0.25 * r

    # the MLP bodies run on 1-D scalar-chain triples (see _mlp_tanh_scalar);
    # the spatial chain rule lifts them back onto the feature stacks once
    lam = _chain5(_mlp_tanh_scalar(l1w, l1b, l2w, l2b, low, lob,
                                   t[0], r_feat, hidden), t)
    mu = _chain5(_mlp_tanh_scalar(m1w, m1b, m2w, m2b, mow, mob,
                                  eta2[0], r_feat, hidden), eta2)
    c = _LOG_CORR_CAP
    corr = _s_exp(_s_tanh((lam + mu) * (1.0 / c)) * c)
    psi = _s_mul(phi, corr)
    return psi[0], psi[4]


def _pad_points(arr, n_pad, value, sub):
    n = arr.shape[0]
    return jnp.pad(arr, (0, n_pad - n),
                   constant_values=value).reshape(-1, sub, _LANE)


def _pt_spec(sub):
    return pl.BlockSpec((1, sub, _LANE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


_W_NAMES = (("lam1", "w"), ("lam1", "b"), ("lam2", "w"), ("lam2", "b"),
            ("lamout", "w"), ("lamout", "b"),
            ("mu1", "w"), ("mu1", "b"), ("mu2", "w"), ("mu2", "b"),
            ("muout", "w"), ("muout", "b"))


@functools.lru_cache(maxsize=64)
def make_fused_psi_lap_separable(hidden: int, p_sym: int, ry: float,
                                 rz: float, interpret: bool = False,
                                 point_grads: bool = False):
    """Build the custom-VJP fused (psi, lap) evaluator for the separable
    family with the given static shape/symmetry.

    Signature (all float32/float64, n points):
        fused(l1w (2,H), l1b (1,H), l2w (H,H), l2b (1,H), low (H,1),
              lob (1,1), m1w, m1b, m2w, m2b, mow, mob,
              a (n,), b (n,), x (n,), y (n,), z (n,), r (n,))
            -> (psi (n,), lap (n,))
    With ``point_grads=False`` the backward skips the geometry chains and
    returns zeros for (dx, dy, dz, dr) — exact when the caller
    stop-gradients the point coordinates (psi_lap_train_separable does).
    """
    core = functools.partial(_core, hidden=hidden, p_sym=p_sym, ry=ry, rz=rz)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    w_shapes = ((2, hidden), (1, hidden), (hidden, hidden), (1, hidden),
                (hidden, 1), (1, 1)) * 2

    def fwd_kernel(x_ref, y_ref, z_ref, r_ref, a_ref, b_ref, *rest):
        w_refs = rest[:12]
        psi_ref, lap_ref = rest[12:]
        weights = tuple(w[:] for w in w_refs)
        psi, lap = core(weights, a_ref[0], b_ref[0],
                        x_ref[0], y_ref[0], z_ref[0], r_ref[0])
        psi_ref[0] = psi
        lap_ref[0] = lap

    n_pt_outs = 6 if point_grads else 2

    def bwd_kernel(x_ref, y_ref, z_ref, r_ref, a_ref, b_ref, *rest):
        w_refs = rest[:12]
        dpsi_ref, dlap_ref = rest[12:14]
        outs = rest[14:]  # [dx,dy,dz,dr,] da, db, 12 per-tile weight grads
        pt_outs, w_outs = outs[:n_pt_outs], outs[n_pt_outs:]
        weights = tuple(w[:] for w in w_refs)
        x, y, z, r = x_ref[0], y_ref[0], z_ref[0], r_ref[0]

        def f(w, a_, b_, *pt):
            return core(w, a_, b_, *((x, y, z, r) if not point_grads
                                     else pt))

        if point_grads:
            _, vjp = jax.vjp(f, weights, a_ref[0], b_ref[0], x, y, z, r)
            dw, da, db, dx, dy, dz, dr = vjp((dpsi_ref[0], dlap_ref[0]))
            pt_vals = (dx, dy, dz, dr, da, db)
        else:
            _, vjp = jax.vjp(f, weights, a_ref[0], b_ref[0])
            dw, da, db = vjp((dpsi_ref[0], dlap_ref[0]))
            pt_vals = (da, db)
        for ref, val in zip(pt_outs, pt_vals):
            ref[0] = val
        # per-tile partial weight grads (cross-tile sum in XLA — revisited
        # VMEM accumulators measured 10x slower, see pallas_train)
        for ref, val in zip(w_outs, dw):
            ref[0] = val

    def run_fwd(*args):
        ws, (a, b, x, y, z, r) = args[:12], args[12:]
        n = x.shape[0]
        tile = _SUB * _LANE
        n_pad = -(-n // tile) * tile
        dtype = x.dtype
        pts = [_pad_points(v, n_pad, 1.0, _SUB) for v in (x, y, z, r)]
        ab = [_pad_points(v, n_pad, 1.0, _SUB) for v in (a, b)]
        spec = _pt_spec(_SUB)
        psi, lap = pl.pallas_call(
            fwd_kernel,
            grid=(n_pad // tile,),
            in_specs=[spec] * 6 + [w_spec] * 12,
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct(pts[0].shape, dtype)] * 2,
            interpret=interpret,
        )(*pts, *ab, *ws)
        return psi.reshape(-1)[:n], lap.reshape(-1)[:n]

    @jax.custom_vjp
    def fused(*args):
        return run_fwd(*args)

    def fused_fwd(*args):
        return run_fwd(*args), args

    def fused_bwd(args, cts):
        ws, (a, b, x, y, z, r) = args[:12], args[12:]
        dpsi, dlap = cts
        n = x.shape[0]
        tile = _SUB_B * _LANE
        n_pad = -(-n // tile) * tile
        dtype = x.dtype
        pts = [_pad_points(v, n_pad, 1.0, _SUB_B) for v in (x, y, z, r)]
        ab = [_pad_points(v, n_pad, 1.0, _SUB_B) for v in (a, b)]
        # padded points carry ZERO cotangents: they must not pollute the
        # accumulated weight gradients
        dcts = [_pad_points(v, n_pad, 0.0, _SUB_B) for v in (dpsi, dlap)]
        pt_shape = jax.ShapeDtypeStruct(pts[0].shape, dtype)
        n_tiles = n_pad // tile
        spec = _pt_spec(_SUB_B)
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=[spec] * 6 + [w_spec] * 12 + [spec] * 2,
            out_specs=[spec] * n_pt_outs + [
                pl.BlockSpec((1,) + s, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM) for s in w_shapes],
            out_shape=[pt_shape] * n_pt_outs + [
                jax.ShapeDtypeStruct((n_tiles,) + s, dtype)
                for s in w_shapes],
            interpret=interpret,
        )(*pts, *ab, *ws, *dcts)
        flat = [o.reshape(-1)[:n] for o in outs[:n_pt_outs]]
        if point_grads:
            dx, dy, dz, dr, da, db = flat
        else:
            da, db = flat
            dx = dy = dz = dr = jnp.zeros_like(x)
        dws = tuple(o.sum(axis=0) for o in outs[n_pt_outs:])
        return dws + (da, db, dx, dy, dz, dr)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def psi_lap_train_separable(params: dict, mcfg, x, y, z, r,
                            interpret: bool = False,
                            point_grads: bool = False):
    """(psi, lap, E) through the fused separable training kernel — drop-in
    for the XLA ``ansatz.psi_fwdlap`` separable path. The R-only heads
    (E, alpha, b) run and autodiff in XLA; the spatial network runs in the
    Pallas kernel via its custom VJP, so ``jax.grad`` of any loss composes
    exactly."""
    from ..models import ansatz

    if "lam1" not in params:
        raise NotImplementedError("psi_lap_train_separable needs separable "
                                  "params (lam*/mu* subtrees)")
    if "node1" in params or "rnode1" in params or "enode1" in params:
        raise NotImplementedError(
            "the fused separable kernel does not implement the xi_node / "
            "eta_node factors (excited states) — use kernel='xla'")
    hidden = params["lam1"]["w"].shape[1]
    dtype = x.dtype
    if not point_grads:
        x, y, z = map(jax.lax.stop_gradient, (x, y, z))
        r_pts = jax.lax.stop_gradient(r)
    else:
        r_pts = r
    e = ansatz.energy(params, r)
    a = ansatz.orbital_exponent(params, r)
    b = ansatz.gz_exponent(params, r, mcfg.inversion_symmetry, a)
    fused = make_fused_psi_lap_separable(
        hidden, int(mcfg.inversion_symmetry), float(mcfg.ry),
        float(mcfg.rz), interpret, point_grads)
    ws = tuple(params[k][f].reshape(
        (1, -1) if (f == "b") else params[k][f].shape).astype(dtype)
        for k, f in _W_NAMES)
    psi, lap = fused(*ws, a.astype(dtype), b.astype(dtype),
                     x, y, z, r_pts)
    return psi, lap, e
