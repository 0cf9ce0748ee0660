"""Loss functions: PDE residual + boundary-decay penalty.

Reference semantics (``poc/main.py:341-355``, ``train.py:54-57``):

    L_pde = mean(residual^2)            over the whole collocation batch
    L_bc  = mean(psi^2 | r1 >= BCcutoff) + mean(psi^2 | r2 >= BCcutoff)
    L_tot = lam_pde * L_pde + lam_bc * L_bc        (lam = 1, 1)

The boundary terms are masked fixed-shape means (see ops/sampling.py) so the
loss is identical under jit on one chip and under pjit/shard_map on a mesh.
The residual uses the fused forward-Laplacian pass — one network traversal
yields psi, lap psi and E simultaneously.
"""

from __future__ import annotations

import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import ansatz
from ..ops import operators
from ..ops.sampling import Batch, masked_mean


def pallas_unsupported_reason(params: dict, mcfg) -> str | None:
    """Why the fused Pallas kernels cannot run this model family (or None).

    The kernels predate the pi/delta transverse factor (ModelConfig.m_abs)
    and the excited-state node factors (params node1/rnode1/enode1). Both
    loss paths use this single guard so ``--kernel pallas`` on an uncovered
    family warns loudly and falls back to the XLA fwdlap path instead of
    silently substituting it (or raising from inside the kernel)."""
    if mcfg.m_abs:
        return ("the fused Pallas kernels do not implement the m_abs "
                "transverse factor (pi/delta states)")
    if "node1" in params or "rnode1" in params or "enode1" in params:
        return ("the fused Pallas kernels do not implement the xi_node / "
                "eta_node factors (excited states)")
    return None


def _pallas_or_fallback(params: dict, mcfg) -> bool:
    """True if the Pallas kernel can run; warns + False otherwise."""
    reason = pallas_unsupported_reason(params, mcfg)
    if reason is None:
        return True
    warnings.warn(f"kernel='pallas' requested but {reason}; "
                  "falling back to the XLA fwdlap path", stacklevel=3)
    return False


class LossAux(NamedTuple):
    l_pde: jax.Array
    l_bc: jax.Array
    e_last: jax.Array   # E of the last batch point (reference history E_h[tt]=E[-1])
    e_mean: jax.Array


def loss_fn(params: dict, cfg: Config, batch: Batch,
            lam_pde: float = 1.0, lam_bc: float = 1.0,
            allreduce=None):
    """Total loss and aux metrics for one collocation batch.

    ``allreduce`` generalises every batch reduction: the loss is written as
    (sum, count) statistics with ``allreduce`` applied to each, so the SAME
    code computes the exact global loss on one device (identity, the
    default), under GSPMD (identity — the batch is a global array and XLA
    inserts the collectives), and inside ``shard_map`` (``lax.psum`` over the
    data axis, see parallel/mesh.py) — including the scale-invariant
    normaliser, LCAO residual weighting and the correction regulariser,
    whose normalisers are GLOBAL means. ``aux.e_last`` is the LOCAL last
    point's E under shard_map; the caller selects the global one.
    """
    ar = (lambda v: v) if allreduce is None else allreduce
    if cfg.train.kernel == "pallas" and _pallas_or_fallback(params, cfg.model):
        # fused Pallas train kernel (custom VJP); interpret mode on CPU so
        # the same config runs in tests and on the virtual mesh. The kernel
        # is selected by the PARAMS (families have distinct subtrees), like
        # ansatz.psi_fwdlap's own dispatch
        if "lam1" in params:
            from ..ops.pallas_separable import psi_lap_train_separable as plt
        else:
            from ..ops.pallas_train import psi_lap_train as plt
        psi_v, lap_v, e = plt(
            params, cfg.model, batch.x, batch.y, batch.z, batch.r,
            interpret=jax.default_backend() == "cpu")
    else:
        fwd = ansatz.psi_fwdlap
        if cfg.train.remat:
            # recompute the fwdlap pass in the backward instead of
            # materialising its residuals through HBM (config.remat)
            fwd = jax.checkpoint(fwd, static_argnums=(1,))
        s, e = fwd(params, cfg.model, batch.x, batch.y,
                   batch.z, batch.r)
        psi_v, lap_v = s.v[..., 0], s.l[..., 0]
    res = operators.RESIDUALS[cfg.convention](
        cfg.model, batch.x, batch.y, batch.z, batch.r, psi_v, lap_v, e)
    n = ar(jnp.asarray(res.shape[0], res.dtype))  # global point count
    if cfg.train.residual_weight == "lcao":
        # local-energy-variance weighting: |(H-E)psi|^2 weighted by the
        # LCAO density (param-free surrogate for psi^2), floored so the far
        # field keeps anchoring the eigenvalue through the tail decay
        w = ansatz.lcao(cfg.model, batch.x, batch.y, batch.z, batch.r) ** 2
        w = w / (ar(jnp.sum(w)) / n + 1e-30)
        floor = cfg.train.residual_weight_floor
        weight = (w + floor) / (1.0 + floor)
        l_pde = ar(jnp.sum(res ** 2 * weight)) / n
    else:
        l_pde = ar(jnp.sum(res ** 2)) / n
    psi2 = psi_v ** 2

    def bc_mean(mask):
        count = jnp.maximum(ar(jnp.sum(mask)), 1)
        return ar(jnp.sum(jnp.where(mask, psi2, 0.0))) / count

    l_bc = bc_mean(batch.bc1) + bc_mean(batch.bc2)
    if cfg.train.scale_invariant:
        # remove the amplitude-collapse mode: both terms become invariant
        # under psi -> c * psi (differentiable through the normaliser)
        norm = ar(jnp.sum(psi2)) / n + 1e-30
        l_pde = l_pde / norm
        l_bc = l_bc / norm
    l_tot = lam_pde * l_pde + lam_bc * l_bc
    if cfg.train.correction_reg > 0.0:
        lc = ansatz.lcao(cfg.model, batch.x, batch.y, batch.z, batch.r,
                         params)
        corr = psi_v - lc
        l_tot = l_tot + cfg.train.correction_reg * (
            (ar(jnp.sum(corr ** 2)) / n)
            / (ar(jnp.sum(lc ** 2)) / n + 1e-30))
    return l_tot, LossAux(l_pde, l_bc, e[-1], ar(jnp.sum(e)) / n)


def loss_and_grad(params: dict, cfg: Config, batch: Batch):
    (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    return l, aux, grads
