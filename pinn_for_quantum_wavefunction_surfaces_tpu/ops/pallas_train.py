"""Pallas TPU training kernel: fused psi + lap(psi) with a custom VJP.

Round-1's forward kernel (ops/pallas_residual.py) covered only the
reference-parity model and only inference; the production train step stayed
on XLA autodiff. This module is the training-grade replacement:

- ONE kernel evaluates the full symmetric ansatz family — the flagship
  included: the Guillemin-Zener envelope exp(-a r1 - b r2) with b = 0 IS the
  LCAO envelope exp(-a r1), so fixed-exponent, trainable-alpha and GZ models
  are all the same kernel with different per-point (a, b) inputs.
- The R-only heads (E, gate, alpha, beta — a few hundred FLOPs per point,
  MXU-irrelevant) stay in XLA, which also autodiffs them: the kernel takes
  their per-point outputs (a, b, g) as inputs and its custom VJP returns
  cotangents for them, so `jax.grad` of any loss built on (psi, lap)
  composes exactly.
- The BACKWARD pass is a second Pallas kernel that RECOMPUTES the forward
  per tile and applies `jax.vjp` of the tile-local core (traced at kernel
  build time — closed-form sigmoid chains, no runtime autodiff machinery),
  accumulating weight gradients across the sequential TPU grid in VMEM.
  Nothing but the point arrays and the two cotangent arrays ever touches
  HBM — XLA's autodiff would materialise every layer activation
  (n x hidden x {v, gx, gy, gz, l}) as residuals.

Replaces the reference's 6-pass ``autograd.grad`` training graph
(``poc/main.py:82-97,341-355``) on the hot path.

Layout: points stream through (8, 128) fp32 VPU tiles; width-16 layer
contractions are unrolled as fused multiply-adds on (8, 128) vregs (an MXU
matmul would waste 112/128 lanes at these widths — measured faster unrolled
in round 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Points per grid step: 8 sublanes x 128 lanes x _ROWS vregs. Larger tiles
# amortise per-grid-step overhead (weight reloads, output DMAs) at the cost
# of live-state; 32x128 measured best for the backward kernel.
_SUB = int(os.environ.get("PALLAS_TRAIN_SUB", 32))
_LANE = 128
_TILE = _SUB * _LANE


def _sigmoid123(v):
    s = jax.nn.sigmoid(v)
    d1 = s * (1.0 - s)
    d2 = d1 * (1.0 - 2.0 * s)
    return s, d1, d2


def _envelope(dx, dy, dz, a):
    """Stacked (v, gx, gy, gz, lap) of exp(-a r) for displacement
    (dx, dy, dz); a is a per-point spatial constant (alpha(R)).

    The 5 derivative components ride as the LEADING (untiled) axis of one
    (5, S, L) array so that every weight scalar downstream multiplies ONE
    tensor: jax.vjp transposes each broadcast-use into a full-tile lane
    reduction, so one-use-per-weight is the difference between ~256 and
    ~2500 reduces per tile in the backward kernel (measured 10x)."""
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv_r = 1.0 / r
    f = jnp.exp(-a * r)
    s = -a * f * inv_r
    return jnp.stack([f, s * dx, s * dy, s * dz,
                      f * (a * a - 2.0 * a * inv_r)])


def _gz_value_lap(dx1, dy1, dz1, dx2, dy2, dz2, a, b):
    """(v, lap) of the Guillemin-Zener envelope exp(-a r1 - b r2)
    (ops/fwdlap.gz_envelope: lap = f (a^2 + b^2 + 2ab u1.u2 - 2a/r1 - 2b/r2));
    only value and laplacian are needed — the GZ part is additive, so its
    spatial gradient enters no product rule."""
    r1 = jnp.sqrt(dx1 * dx1 + dy1 * dy1 + dz1 * dz1)
    r2 = jnp.sqrt(dx2 * dx2 + dy2 * dy2 + dz2 * dz2)
    inv1, inv2 = 1.0 / r1, 1.0 / r2
    f = jnp.exp(-a * r1 - b * r2)
    u1u2 = (dx1 * dx2 + dy1 * dy2 + dz1 * dz2) * inv1 * inv2
    lap = f * (a * a + b * b + 2.0 * a * b * u1u2
               - 2.0 * a * inv1 - 2.0 * b * inv2)
    return f, lap


def _sig_propagate(lin, bias):
    """Push a stacked (5, S, L) linear pre-activation through sigmoid via the
    closed-form forward-Laplacian rules; returns the stacked activation."""
    pre = lin[0] + bias
    s, d1, d2 = _sigmoid123(pre)
    gsq = lin[1] * lin[1] + lin[2] * lin[2] + lin[3] * lin[3]
    return jnp.stack([s, d1 * lin[1], d1 * lin[2], d1 * lin[3],
                      d1 * lin[4] + d2 * gsq])


def _mlp_branch(h_w1, h_b1, h_w2, h_b2, o_w, f1, f2, hidden):
    """(v, lap) of o_w . sig(W2 sig(W1 [f1, f2] + b1) + b2), propagating the
    stacked (v, gx, gy, gz, l) components through the closed-form layer
    rules, unrolled over the width. f1/f2 are (5, S, L) stacks; biases
    (1, H). Each weight scalar multiplies exactly ONE tensor (see
    _envelope's note on the vjp-transpose cost)."""
    a1 = [_sig_propagate(f1 * h_w1[0, j] + f2 * h_w1[1, j], h_b1[0, j])
          for j in range(hidden)]
    out_v = out_l = 0.0
    for j in range(hidden):
        lin = a1[0] * h_w2[0, j]
        for i in range(1, hidden):
            lin = lin + a1[i] * h_w2[i, j]
        a2 = _sig_propagate(lin, h_b2[0, j])
        w = o_w[j, 0]
        out_v = out_v + a2[0] * w
        out_l = out_l + a2[4] * w
    return out_v, out_l


def _core(weights, a, b, g, x, y, z, r, *, hidden, p_sym, ry, rz):
    """Tile-local (psi, lap) of the full symmetric ansatz. Pure jnp on
    (8, 128) blocks — traced both by the forward kernel and by `jax.vjp`
    inside the backward kernel."""
    h_w1, h_b1, h_w2, h_b2, o_w, o_b = weights
    p = float(p_sym)

    d1 = (x - r, y - ry, z - rz)
    d2 = (x + r, y + ry, z + rz)
    f1 = _envelope(*d1, a)
    f2 = _envelope(*d2, a)
    b_pos = _mlp_branch(h_w1, h_b1, h_w2, h_b2, o_w, f1, f2, hidden)
    # mirrored branch at -x: only gx flips sign, and it enters the laplacian
    # quadratically — evaluate at (-x -+ r) directly
    f1m = _envelope(-x - r, d1[1], d1[2], a)
    f2m = _envelope(-x + r, d2[1], d2[2], a)
    b_m = _mlp_branch(h_w1, h_b1, h_w2, h_b2, o_w, f1m, f2m, hidden)

    # o_b is passed as 0 for the ungerade sector (exact antisymmetry,
    # models/ansatz.psi), so adding unconditionally is correct
    nn_v = b_pos[0] + p * b_m[0] + o_b[0, 0]
    nn_l = b_pos[1] + p * b_m[1]

    gz1_v, gz1_l = _gz_value_lap(*d1, *d2, a, b)
    gz2_v, gz2_l = _gz_value_lap(*d2, *d1, a, b)
    psi = nn_v * g + gz1_v + p * gz2_v
    lap = nn_l * g + gz1_l + p * gz2_l
    return psi, lap


def _pad_points(arr, n_pad, value):
    n = arr.shape[0]
    return jnp.pad(arr, (0, n_pad - n),
                   constant_values=value).reshape(-1, _SUB, _LANE)


@functools.lru_cache(maxsize=64)
def make_fused_psi_lap(hidden: int, p_sym: int, ry: float, rz: float,
                       interpret: bool = False, point_grads: bool = True):
    """Build the custom-VJP fused (psi, lap) evaluator for the symmetric
    ansatz with the given static shape/symmetry.

    Returned callable signature (all float32):
        fused(h1w (2,H), h1b (1,H), h2w (H,H), h2b (1,H), ow (H,1), ob (1,1),
              a (n,), b (n,), g (n,), x (n,), y (n,), z (n,), r (n,))
            -> (psi (n,), lap (n,))
    Differentiable in EVERY argument (point-coordinate cotangents included,
    so force-through-batch style uses stay correct). With
    ``point_grads=False`` the backward SKIPS the geometry chains and returns
    zeros for (dx, dy, dz, dr) — only valid when the caller stop-gradients
    the point coordinates (psi_lap_train does), where zero IS the exact
    gradient.
    """
    core = functools.partial(_core, hidden=hidden, p_sym=p_sym, ry=ry, rz=rz)
    pt_spec = pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    w_shapes = (( 2, hidden), (1, hidden), (hidden, hidden), (1, hidden),
                (hidden, 1), (1, 1))

    def fwd_kernel(x_ref, y_ref, z_ref, r_ref, a_ref, b_ref, g_ref,
                   *rest):
        w_refs = rest[:6]
        psi_ref, lap_ref = rest[6:]
        weights = tuple(w[:] for w in w_refs)
        psi, lap = core(weights, a_ref[0], b_ref[0], g_ref[0],
                        x_ref[0], y_ref[0], z_ref[0], r_ref[0])
        psi_ref[0] = psi
        lap_ref[0] = lap

    n_pt_outs = 7 if point_grads else 3

    def bwd_kernel(x_ref, y_ref, z_ref, r_ref, a_ref, b_ref, g_ref,
                   *rest):
        w_refs = rest[:6]
        dpsi_ref, dlap_ref = rest[6:8]
        outs = rest[8:]  # [dx,dy,dz,dr,] da, db, dg, 6 PER-TILE weight grads
        pt_outs, w_outs = outs[:n_pt_outs], outs[n_pt_outs:]
        weights = tuple(w[:] for w in w_refs)
        x, y, z, r = x_ref[0], y_ref[0], z_ref[0], r_ref[0]

        def f(w, a_, b_, g_, *pt):
            return core(w, a_, b_, g_, *((x, y, z, r) if not point_grads
                                         else pt))

        if point_grads:
            _, vjp = jax.vjp(f, weights, a_ref[0], b_ref[0], g_ref[0],
                             x, y, z, r)
            dw, da, db, dg, dx, dy, dz, dr = vjp((dpsi_ref[0], dlap_ref[0]))
            pt_vals = (dx, dy, dz, dr, da, db, dg)
        else:
            # geometry chains skipped: the caller stop-gradients the point
            # coordinates, so their cotangents are exactly zero by contract
            _, vjp = jax.vjp(f, weights, a_ref[0], b_ref[0], g_ref[0])
            dw, da, db, dg = vjp((dpsi_ref[0], dlap_ref[0]))
            pt_vals = (da, db, dg)
        for ref, val in zip(pt_outs, pt_vals):
            ref[0] = val
        # weight grads: write THIS tile's partial into its own slot —
        # revisited-accumulator outputs round-trip VMEM<->HBM every grid
        # step (measured 10x slower); the cross-tile sum is a trivial XLA
        # reduction outside the kernel
        for ref, val in zip(w_outs, dw):
            ref[0] = val

    def run_fwd(h1w, h1b, h2w, h2b, ow, ob, a, b, g, x, y, z, r):
        n = x.shape[0]
        n_pad = -(-n // _TILE) * _TILE
        dtype = x.dtype
        pts = [_pad_points(v, n_pad, 1.0) for v in (x, y, z, r)]
        abg = [_pad_points(v, n_pad, 1.0) for v in (a, b, g)]
        ws = (h1w, h1b, h2w, h2b, ow, ob)
        psi, lap = pl.pallas_call(
            fwd_kernel,
            grid=(n_pad // _TILE,),
            in_specs=[pt_spec] * 7 + [w_spec] * 6,
            out_specs=[pt_spec, pt_spec],
            out_shape=[jax.ShapeDtypeStruct(pts[0].shape, dtype)] * 2,
            interpret=interpret,
        )(*pts, *abg, *ws)
        return psi.reshape(-1)[:n], lap.reshape(-1)[:n]

    @jax.custom_vjp
    def fused(h1w, h1b, h2w, h2b, ow, ob, a, b, g, x, y, z, r):
        return run_fwd(h1w, h1b, h2w, h2b, ow, ob, a, b, g, x, y, z, r)

    def fused_fwd(*args):
        return run_fwd(*args), args

    def fused_bwd(args, cts):
        h1w, h1b, h2w, h2b, ow, ob, a, b, g, x, y, z, r = args
        dpsi, dlap = cts
        n = x.shape[0]
        n_pad = -(-n // _TILE) * _TILE
        dtype = x.dtype
        pts = [_pad_points(v, n_pad, 1.0) for v in (x, y, z, r)]
        abg = [_pad_points(v, n_pad, 1.0) for v in (a, b, g)]
        # cotangents of padded points are ZERO: they must not contribute to
        # the accumulated weight gradients
        dcts = [_pad_points(v, n_pad, 0.0) for v in (dpsi, dlap)]
        ws = (h1w, h1b, h2w, h2b, ow, ob)
        pt_shape = jax.ShapeDtypeStruct(pts[0].shape, dtype)
        n_tiles = n_pad // _TILE
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_tiles,),
            in_specs=[pt_spec] * 7 + [w_spec] * 6 + [pt_spec] * 2,
            out_specs=[pt_spec] * n_pt_outs + [
                pl.BlockSpec((1,) + s, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM) for s in w_shapes],
            out_shape=[pt_shape] * n_pt_outs + [
                jax.ShapeDtypeStruct((n_tiles,) + s, dtype)
                for s in w_shapes],
            interpret=interpret,
        )(*pts, *abg, *ws, *dcts)
        flat = [o.reshape(-1)[:n] for o in outs[:n_pt_outs]]
        if point_grads:
            dx, dy, dz, dr, da, db, dg = flat
        else:
            da, db, dg = flat
            dx = dy = dz = dr = jnp.zeros_like(x)
        # cross-tile sum of the per-tile partials (cheap XLA reduction)
        dh1w, dh1b, dh2w, dh2b, dow, dob = (
            o.sum(axis=0) for o in outs[n_pt_outs:])
        return (dh1w, dh1b, dh2w, dh2b, dow, dob, da, db, dg, dx, dy, dz, dr)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def psi_lap_train(params: dict, mcfg, x, y, z, r, interpret: bool = False,
                  point_grads: bool = False):
    """(psi, lap, E) through the fused training kernel — a drop-in,
    fully differentiable replacement for the XLA ``ansatz.psi_fwdlap`` hot
    path. The R-only heads run (and autodiff) in XLA; the spatial network
    runs in the Pallas kernel via its custom VJP.

    Covers the whole symmetric family: fixed exponents, trainable alpha(R),
    and Guillemin-Zener b(R) (the flagship). Raises for the minimal arch and
    r-input models (XLA path covers those).

    By default the point coordinates are STOP-GRADIENTED (training treats
    the collocation batch as data) and the backward kernel skips their
    geometry chains; pass ``point_grads=True`` to differentiate through
    (x, y, z, r) as well (e.g. force-through-batch analyses).
    """
    from ..models import ansatz

    if mcfg.arch != "symmetric":
        raise NotImplementedError("pallas training kernel covers the "
                                  "symmetric architecture")
    if params["h1"]["w"].shape[0] != 2:
        raise NotImplementedError("r-input models use the XLA fwdlap path")
    hidden = params["h1"]["w"].shape[1]
    dtype = x.dtype
    if not point_grads:
        # zero point-cotangents in the fast kernel are exact BECAUSE of this
        x, y, z = map(jax.lax.stop_gradient, (x, y, z))
        r_pts = jax.lax.stop_gradient(r)
    else:
        r_pts = r
    e = ansatz.energy(params, r)
    g = ansatz.gate(params, r)
    if "alpha1" in params:
        a = ansatz.orbital_exponent(params, r)
    else:
        a = jnp.ones_like(r)
    if "beta1" in params:
        b = ansatz.gz_exponent(params, r, mcfg.inversion_symmetry, a)
    else:
        b = jnp.zeros_like(r)
    if mcfg.inversion_symmetry > 0:
        ob = params["out"]["b"].reshape(1, 1).astype(dtype)
    else:
        ob = jnp.zeros((1, 1), dtype)
    fused = make_fused_psi_lap(hidden, int(mcfg.inversion_symmetry),
                               float(mcfg.ry), float(mcfg.rz), interpret,
                               point_grads)
    psi, lap = fused(
        params["h1"]["w"].astype(dtype),
        params["h1"]["b"].reshape(1, -1).astype(dtype),
        params["h2"]["w"].astype(dtype),
        params["h2"]["b"].reshape(1, -1).astype(dtype),
        params["out"]["w"].astype(dtype),
        ob,
        a.astype(dtype), b.astype(dtype), g.astype(dtype), x, y, z, r_pts)
    return psi, lap, e
