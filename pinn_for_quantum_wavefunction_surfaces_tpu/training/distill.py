"""Eigenvalue-head distillation: fit E(R) to the Rayleigh quotient of the
trained wavefunction directly.

The reference's stage-2 (freeze psi, SGD on the PDE residual, reference
poc/main.py:930-942) lets the E head drift toward the per-R eigenvalue
implied by psi. But with psi frozen, the optimal eigenvalue at each R is a
CLOSED-FORM quantity — the Rayleigh quotient E*(R) = <psi|H|psi>/<psi|psi> —
so this module computes E*(R) on a grid of R values by quadrature (fast, a
few seconds per surface) and fits the E head to it by direct regression
(Adam on MSE). This converges in seconds and lands the head ON the
variational energy of psi instead of a residual-weighted compromise.

This is a capability the reference does not have; the classic fine-tune
schedule remains available in ``engine.finetune`` for parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import ansatz
from ..analysis import energy as aen


def rayleigh_targets(params: dict, cfg: Config, r_values=None,
                     n: Optional[int] = None, scheme: str = "avg",
                     grid: str = "spheroidal",
                     mesh=None) -> tuple[np.ndarray, np.ndarray]:
    """E*(R) = <psi|H|psi>/<psi|psi> at each R (quadrature). Targets default
    to prolate-spheroidal Gauss quadrature — machine-precision for this
    two-centre problem with ~10^4 points (analysis.energy
    .rayleigh_quotient_spheroidal)."""
    dom = cfg.domain
    if r_values is None:
        r_values = np.round(np.arange(dom.r_lo, dom.r_hi + 0.05, 0.05), 3)
    r_values = np.asarray(r_values, np.float64)
    targets = np.zeros(len(r_values))
    for i, ri in enumerate(r_values):
        if mesh is not None:
            targets[i] = aen.rayleigh_quotient_sharded(
                params, cfg, float(ri), mesh, n=n, scheme=scheme)
        elif grid == "spheroidal":
            targets[i] = aen.rayleigh_quotient_spheroidal(params, cfg,
                                                          float(ri))
        elif grid == "adapted":
            n_eff = (n or cfg.train.n_test)
            n_eff = n_eff * 2 if ri < 1.6 else n_eff
            targets[i] = aen.rayleigh_quotient_adapted(params, cfg, float(ri),
                                                       n=n_eff)
        else:
            targets[i] = aen.rayleigh_quotient(params, cfg, float(ri), n=n,
                                               scheme=scheme)
    return r_values, targets


def fit_energy_head(params: dict, r_values, targets, lr: float = 3e-3,
                    steps: int = 5000, lbfgs_steps: int = 8000) -> dict:
    """Regress the E head onto (r, E*) pairs; all other subtrees untouched.

    Adam for the bulk, then a full-batch L-BFGS finisher on the same MSE
    (a ~1k-parameter deterministic least-squares problem — L-BFGS drops the
    fit RMS another ~10x below where Adam plateaus, which matters once the
    psi being distilled is accurate to a few hundredths of a mHa)."""
    r = jnp.asarray(r_values)
    t = jnp.asarray(targets)
    dtype = jnp.result_type(*jax.tree.leaves(params))
    r, t = r.astype(dtype), t.astype(dtype)

    head = {k: params[k] for k in ("e1", "e2", "eout")}
    rest = {k: v for k, v in params.items() if k not in head}

    def loss(head):
        e = ansatz.energy({**rest, **head}, r)
        return jnp.mean((e - t) ** 2)

    opt = optax.adam(lr)
    opt_state = opt.init(head)

    def run(head, opt_state):
        def body(carry, _):
            head, opt_state = carry
            l, g = jax.value_and_grad(loss)(head)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(head, updates), opt_state), l
        (head, opt_state), ls = jax.lax.scan(body, (head, opt_state), None,
                                             length=steps)
        return head, ls

    head, ls = jax.jit(run)(head, opt_state)

    if lbfgs_steps:
        lb = optax.lbfgs()
        vg = optax.value_and_grad_from_state(loss)

        @jax.jit
        def lb_run(head):
            # keep the BEST iterate: a late linesearch overshoot must not
            # erase the descent (same policy as the variational polish)
            def body(carry, _):
                head, st, best_h, best_v = carry
                value, grad = vg(head, state=st)
                better = value < best_v
                best_h = jax.tree.map(
                    lambda b, c: jnp.where(better, c, b), best_h, head)
                best_v = jnp.where(better, value, best_v)
                updates, st = lb.update(grad, st, head, value=value,
                                        grad=grad, value_fn=loss)
                return (optax.apply_updates(head, updates), st,
                        best_h, best_v), value
            init = (head, lb.init(head), head,
                    jnp.asarray(jnp.inf, t.dtype))
            (head, _, best_h, _), _ = jax.lax.scan(body, init, None,
                                                   length=lbfgs_steps)
            return best_h

        head = lb_run(head)
    return {**rest, **jax.tree.map(np.asarray, head)}


def distill(params: dict, cfg: Config, n: Optional[int] = None,
            r_values=None, lr: float = 3e-3, steps: int = 5000,
            mesh=None) -> tuple[dict, dict]:
    """Full distillation: quadrature targets -> head regression.

    Returns (new_params, info) where info carries the targets and the final
    fit residual."""
    r, t = rayleigh_targets(params, cfg, r_values, n=n, mesh=mesh)
    new_params = fit_energy_head(params, r, t, lr=lr, steps=steps)
    e_fit = np.asarray(ansatz.energy(new_params, jnp.asarray(
        r, jnp.result_type(*jax.tree.leaves(new_params)))))
    info = {"R": r, "targets": t, "fit": e_fit,
            "fit_rms": float(np.sqrt(np.mean((e_fit - t) ** 2)))}
    return new_params, info
