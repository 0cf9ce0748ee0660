"""Per-R "multi-model" legacy mode: one independent model per bond length.

The reference kept a vestigial path that trains a separate checkpoint per R
value and assembles E(R) from the family (``trainMultipleModels`` /
``evaluateMultipleModels`` / ``plot_EforR``, reference poc/main.py:680-910 —
note those functions call removed 3-arg signatures and would crash there;
this is the working re-design, built on the parametric engine with
``domain.fixed_r`` pinned per run).

TPU-first twist: models in the sweep are INDEPENDENT, so with a device mesh
the whole family trains simultaneously — one model per device via `vmap` over
a leading model axis + `shard_map` (model-parallel over the sweep axis),
instead of the reference's sequential python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import ansatz
from ..ops.sampling import sample_batch_at_r
from . import engine


def _fixed_r_cfg(cfg: Config, ri: float) -> Config:
    return dataclasses.replace(
        cfg, domain=dataclasses.replace(cfg.domain, fixed_r=float(ri)))


def train_per_r(cfg: Config, r_values: Sequence[float],
                log_cb=None) -> dict:
    """Sequential per-R training (the reference's semantics). Returns
    {"R": ..., "E_net": ..., "params": [per-R param trees], "best_loss": ...}.
    """
    e_net, losses, params_list = [], [], []
    for ri in r_values:
        res = engine.train(_fixed_r_cfg(cfg, ri), log_cb=log_cb)
        params_list.append(res.best_params)
        e_net.append(float(ansatz.energy(res.best_params,
                                         jnp.asarray([ri]))[0]))
        losses.append(res.best_loss)
    return {"R": np.asarray(r_values), "E_net": np.asarray(e_net),
            "params": params_list, "best_loss": np.asarray(losses)}


def polish_per_r(cfg: Config, r_values: Sequence[float],
                 params: dict | None = None, steps: int = 300,
                 n_xi: int = 40, n_eta: int = 24, log_cb=None) -> dict:
    """Per-R family via the DETERMINISTIC spheroidal polish: each bond
    length gets its own copy of the (shared-init or given) params,
    L-BFGS-converged on its exact single-R Rayleigh quotient. With the
    separable arch this lands every member at the family's per-R
    variational optimum (~1e-5 mHa measured) in seconds per R — the
    noise-free upgrade of the reference's per-R multi-model mode."""
    from . import variational

    e_int, params_list = [], []
    for ri in r_values:
        cfgr = _fixed_r_cfg(cfg, ri)
        out = variational.polish_spheroidal(
            params, cfgr, n_r=1, n_xi=n_xi, n_eta=n_eta, steps=steps,
            head_weight=0.0, log_cb=log_cb)
        params_list.append(out)
        from ..analysis import energy as aen
        e_int.append(aen.rayleigh_quotient_spheroidal(out, cfg, float(ri)))
    return {"R": np.asarray(r_values, np.float64),
            "E_net": np.asarray(e_int),  # reference artifact schema slot
            "params": params_list,
            "best_loss": np.asarray(e_int)}


def train_per_r_vmapped(cfg: Config, r_values: Sequence[float],
                        mesh=None, axis: str = "data") -> dict:
    """Train the whole per-R family at once: params get a leading model axis,
    each model samples its own collocation batch at its pinned R, and one
    vmapped update step advances every model per iteration. With ``mesh``,
    the model axis is sharded across devices (model-parallel sweep)."""
    r_values = np.asarray(r_values, dtype=np.float64)
    m = len(r_values)
    t = cfg.train
    optimizer = engine.make_optimizer(cfg)

    keys = jax.random.split(jax.random.PRNGKey(t.seed), m)
    dtype = jnp.dtype(cfg.dtype)
    rs = jnp.asarray(r_values, dtype)

    def init_one(key, ri):
        kp, kb, kc = jax.random.split(key, 3)
        params = ansatz.init_params(kp, cfg.model, dtype)
        batch = sample_batch_at_r(kb, cfg, ri, n=t.n_train)
        big = jnp.asarray(jnp.inf, jnp.promote_types(dtype, jnp.float32))
        return engine.TrainState(jnp.zeros((), jnp.int32), params,
                                 optimizer.init(params), batch, params, big,
                                 params, kc)

    states = jax.vmap(init_one)(keys, rs)

    resample_cutoff = int(t.resample_frac * t.epochs)

    def one_step(state, ri):
        import optax
        from .losses import loss_fn
        key, sub = jax.random.split(state.key)
        do_resample = jnp.logical_and(state.step % t.resample_every == 0,
                                      state.step < resample_cutoff)

        batch = jax.lax.cond(do_resample,
                             lambda k: sample_batch_at_r(k, cfg, ri,
                                                         n=t.n_train),
                             lambda k: state.batch, sub)
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cfg, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)
        improved = l < state.best_loss
        best = jax.tree.map(lambda n_, o: jnp.where(improved, n_, o),
                            state.params, state.best_params)
        return engine.TrainState(
            state.step + 1, new_params, opt_state, batch, best,
            jnp.where(improved, l, state.best_loss).astype(
                state.best_loss.dtype), state.ema_params, key), l

    def chunk(states, _):
        def scan_model(state, ri):
            return one_step(state, ri)
        states, losses = jax.vmap(scan_model)(states, rs)
        return states, losses

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(axis))
        states = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, sh)
            if a.ndim >= 1 else a, states)

    run = jax.jit(lambda s: jax.lax.scan(chunk, s, None, length=t.epochs))
    states, losses = run(states)

    e_net = jax.vmap(lambda p, ri: ansatz.energy(p, ri[None])[0])(
        states.best_params, rs)
    return {"R": r_values, "E_net": np.asarray(e_net),
            "params": states.best_params,
            "best_loss": np.asarray(states.best_loss),
            "loss_history": np.asarray(losses)}
