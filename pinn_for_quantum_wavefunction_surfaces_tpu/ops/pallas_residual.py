"""Pallas TPU kernel: fused psi + laplacian(psi) evaluation.

One kernel pass computes the full physics-baked ansatz AND its laplacian for
a tile of collocation/grid points, with every weight resident in VMEM and no
intermediate ever touching HBM: envelopes (with analytic gradient/laplacian
seeds), both mirrored correction-MLP branches propagating the (value, grad,
lap) triple through closed-form layer rules, the R-gate, and the LCAO part.

This is the forward analogue of :func:`..models.ansatz.psi_fwdlap` for the
forward-only hot paths — quadrature slabs in the E(R) Rayleigh-quotient
extraction (512k..15.6M points per R, reference poc/main.py:438-464) and
inference probes — where no parameter gradients are needed. Training keeps
the XLA-autodiff path.

Layout: points are processed in (8, 128)-shaped tiles (fp32 VPU native
tile). The MLP widths (2 -> H -> H -> 1) are far below the 128-lane MXU
tile, so contractions are unrolled as H fused multiply-adds on (8, 128)
vregs — pure VPU work, which is the right unit for width-16 layers (an MXU
matmul would waste 112/128 lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig

# fp32 native tile
_SUB, _LANE = 8, 128
_TILE = _SUB * _LANE


def _sigmoid123(v):
    """sigmoid and its first two derivatives."""
    s = jax.nn.sigmoid(v)
    d1 = s * (1.0 - s)
    d2 = d1 * (1.0 - 2.0 * s)
    return s, d1, d2


def _envelope(dx, dy, dz):
    """value/grad/lap triple of exp(-r) for displacement (dx, dy, dz)."""
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv_r = 1.0 / r
    f = jnp.exp(-r)
    gx, gy, gz = -f * dx * inv_r, -f * dy * inv_r, -f * dz * inv_r
    lap = f * (1.0 - 2.0 * inv_r)
    return f, gx, gy, gz, lap


def _mlp_branch(h_w1, h_b1, h_w2, h_b2, o_w, f1, f2, hidden):
    """Propagate (v, gx, gy, gz, l) for both envelope features through
    sig(W2 sig(W1 [f1, f2] + b1) + b2) . o_w, unrolled over the width.

    f1/f2 are 5-tuples (v, gx, gy, gz, l) of (8, 128) blocks.
    Returns the branch output triple (v, gx, gy, gz, l), all (8, 128).
    """
    # layer 1: 2 -> hidden
    a1 = []  # list of per-unit triples
    for j in range(hidden):
        pre = f1[0] * h_w1[0, j] + f2[0] * h_w1[1, j] + h_b1[j]
        gx = f1[1] * h_w1[0, j] + f2[1] * h_w1[1, j]
        gy = f1[2] * h_w1[0, j] + f2[2] * h_w1[1, j]
        gz = f1[3] * h_w1[0, j] + f2[3] * h_w1[1, j]
        l = f1[4] * h_w1[0, j] + f2[4] * h_w1[1, j]
        s, d1, d2 = _sigmoid123(pre)
        gsq = gx * gx + gy * gy + gz * gz
        a1.append((s, d1 * gx, d1 * gy, d1 * gz, d1 * l + d2 * gsq))
    # layer 2: hidden -> hidden, then contract with o_w into the output unit
    out_v = out_gx = out_gy = out_gz = out_l = 0.0
    for j in range(hidden):
        pre = h_b2[j]
        gx = gy = gz = l = 0.0
        for i in range(hidden):
            pre = pre + a1[i][0] * h_w2[i, j]
            gx = gx + a1[i][1] * h_w2[i, j]
            gy = gy + a1[i][2] * h_w2[i, j]
            gz = gz + a1[i][3] * h_w2[i, j]
            l = l + a1[i][4] * h_w2[i, j]
        s, d1, d2 = _sigmoid123(pre)
        gsq = gx * gx + gy * gy + gz * gz
        w = o_w[j, 0]
        out_v = out_v + s * w
        out_gx = out_gx + d1 * gx * w
        out_gy = out_gy + d1 * gy * w
        out_gz = out_gz + d1 * gz * w
        out_l = out_l + (d1 * l + d2 * gsq) * w
    return out_v, out_gx, out_gy, out_gz, out_l


def _make_kernel(mcfg: ModelConfig):
    hidden = mcfg.hidden
    p_sym = float(mcfg.inversion_symmetry)

    def kernel(x_ref, y_ref, z_ref, r_ref,
               h_w1, h_b1, h_w2, h_b2, o_w, o_b,
               g_w1, g_b1, g_w2, g_b2,
               psi_ref, lap_ref):
        x, y, z, r = x_ref[:], y_ref[:], z_ref[:], r_ref[:]

        f1 = _envelope(x - r, y - mcfg.ry, z - mcfg.rz)
        f2 = _envelope(x + r, y + mcfg.ry, z + mcfg.rz)
        b_pos = _mlp_branch(h_w1[:], h_b1[:], h_w2[:], h_b2[:], o_w[:],
                            f1, f2, hidden)

        # mirrored branch: evaluated at -x; x-gradients re-oriented by the
        # mirror (laplacian is invariant)
        f1m = _envelope(-x - r, y - mcfg.ry, z - mcfg.rz)
        f2m = _envelope(-x + r, y + mcfg.ry, z + mcfg.rz)
        b_m = _mlp_branch(h_w1[:], h_b1[:], h_w2[:], h_b2[:], o_w[:],
                          f1m, f2m, hidden)

        # output bias only in the gerade sector (exact antisymmetry for P=-1,
        # matching models/ansatz.py)
        nn_v = b_pos[0] + p_sym * b_m[0] + (o_b[0] if p_sym > 0 else 0.0)
        nn_l = b_pos[4] + p_sym * b_m[4]

        # gate(R): width-`hidden_gate` sigmoid MLP on R, spatially constant
        gate = g_b2[0]
        for j in range(g_w1.shape[1]):
            gate = gate + jax.nn.sigmoid(r * g_w1[0, j] + g_b1[j]) * g_w2[j, 0]

        psi_ref[:] = nn_v * gate + f1[0] + p_sym * f2[0]
        lap_ref[:] = nn_l * gate + f1[4] + p_sym * f2[4]

    return kernel


@functools.partial(jax.jit, static_argnames=("mcfg", "interpret"))
def psi_lap_pallas(params: dict, mcfg: ModelConfig, x, y, z, r,
                   interpret: bool = False):
    """(psi, lap psi) for flat point arrays via the fused Pallas kernel.

    Points are padded to a multiple of the (8, 128) tile; weights live in
    VMEM for the whole grid sweep. ``interpret=True`` runs the kernel in
    interpreter mode (for CPU tests).
    """
    if mcfg.arch != "symmetric":
        raise NotImplementedError("pallas kernel covers the flagship "
                                  "symmetric architecture")
    if any(k in params for k in ("alpha1", "beta1")) or \
            params["h1"]["w"].shape[0] != 2:
        raise NotImplementedError(
            "pallas kernel implements the reference-parity model (fixed "
            "exponents, 2-feature base); use the XLA fwdlap path for "
            "alpha/GZ/r-input extended models")
    n = x.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    dtype = x.dtype

    def pad(a):
        return jnp.pad(a, (0, n_pad - n),
                       constant_values=1.0).reshape(-1, _SUB, _LANE)

    xs, ys, zs, rs = pad(x), pad(y), pad(z), jnp.pad(
        r, (0, n_pad - n), constant_values=1.0).reshape(-1, _SUB, _LANE)

    grid = (n_pad // _TILE,)
    pt_spec = pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = _make_kernel(mcfg)

    def squeeze_kernel(x_ref, y_ref, z_ref, r_ref, *rest):
        # blocks arrive as (1, 8, 128); strip the grid axis for the body
        class V:
            def __init__(self, ref):
                self.ref = ref

            def __getitem__(self, idx):
                return self.ref[0]

        params_refs = rest[:-2]
        out = rest[-2:]

        class O:
            def __init__(self, ref):
                self.ref = ref

            def __setitem__(self, idx, val):
                self.ref[0] = val

        kernel(V(x_ref), V(y_ref), V(z_ref), V(r_ref), *params_refs,
               O(out[0]), O(out[1]))

    weights = (
        params["h1"]["w"].astype(dtype), params["h1"]["b"].astype(dtype),
        params["h2"]["w"].astype(dtype), params["h2"]["b"].astype(dtype),
        params["out"]["w"].astype(dtype), params["out"]["b"].astype(dtype),
        params["gate1"]["w"].astype(dtype), params["gate1"]["b"].astype(dtype),
        params["gate2"]["w"].astype(dtype), params["gate2"]["b"].astype(dtype),
    )

    psi, lap = pl.pallas_call(
        squeeze_kernel,
        grid=grid,
        in_specs=[pt_spec] * 4 + [w_spec] * len(weights),
        out_specs=[pt_spec, pt_spec],
        out_shape=[jax.ShapeDtypeStruct(xs.shape, dtype)] * 2,
        interpret=interpret,
    )(xs, ys, zs, rs, *weights)

    return psi.reshape(-1)[:n], lap.reshape(-1)[:n]
