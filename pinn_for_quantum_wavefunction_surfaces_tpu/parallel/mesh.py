"""Device-mesh data parallelism for collocation batches and quadrature grids.

The reference is strictly single-GPU (SURVEY.md section 2: no distributed code
at all). The scaling axis of this problem is the collocation batch (100k
points x higher-order derivatives) and the quadrature grid (up to 250^3
points): both are embarrassingly parallel over points, so the TPU-native
design shards the POINT dimension over a 1-D mesh and reduces with XLA
collectives over ICI.

Two equivalent paths are provided:

- ``constrain_batch`` + the standard jit step (pjit / GSPMD): annotate the
  batch with ``NamedSharding(P("data"))`` and let XLA insert the all-reduces
  for the global means. Params/optimizer state stay replicated.
- ``make_shardmap_step``: explicit per-device SPMD with ``shard_map`` — each
  device samples ITS OWN sub-batch (PRNG key folded with the device index, so
  no sampling bandwidth is wasted), computes local (sum, count) pairs and
  ``psum``s them. This makes the boundary-mask semantics explicit: the
  boundary loss is a mean over a data-dependent SUBSET, so the reduction must
  be sum-of-sums / sum-of-counts — a mean-of-per-device-means would be wrong
  whenever shards contain different boundary counts (SURVEY.md section 5).

Both produce bit-identical update rules to the single-device step up to
floating-point reduction order; tests/test_parallel.py asserts tolerance
equivalence on an 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..ops.sampling import Batch, sample_batch


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` (default: all) devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(batch: Batch, mesh: Mesh, axis: str = "data") -> Batch:
    """Pin every per-point array of the batch to the data axis (GSPMD path)."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.lax.with_sharding_constraint(a, s), batch)


def shard_state(state, mesh: Mesh, axis: str = "data"):
    """Device-put a TrainState: batch sharded over ``axis``, rest replicated."""
    rep = replicated(mesh)
    sh = batch_sharding(mesh, axis)
    put_rep = lambda t: jax.tree.map(lambda a: jax.device_put(a, rep), t)
    return state._replace(
        step=put_rep(state.step),
        params=put_rep(state.params),
        opt_state=put_rep(state.opt_state),
        batch=jax.tree.map(lambda a: jax.device_put(a, sh), state.batch),
        best_params=put_rep(state.best_params),
        best_loss=put_rep(state.best_loss),
        ema_params=put_rep(state.ema_params),
        key=put_rep(state.key),
    )


# ---------------------------------------------------------------------------
# Explicit shard_map step


def make_shardmap_step(cfg: Config, optimizer, mesh: Mesh,
                       axis: str = "data"):
    """Explicit-SPMD training step over ``mesh``.

    Per-device: sample a local sub-batch (n_train / n_devices points, key
    folded with the device index), evaluate the EXACT global loss via
    ``training.losses.loss_fn`` with ``allreduce = psum`` — every batch
    reduction (point means, boundary-subset means, the scale-invariant
    normaliser, LCAO residual weights, the correction regulariser) becomes a
    psum'd (sum, count) pair, so all loss modes run on this path with
    single-device semantics. Differentiating the replicated global loss
    per-device and psum'ing the gradients would overcount by n_dev (the
    transpose of psum is psum), so each device differentiates its 1/n_dev
    share; psum of those shares is the exact global loss and gradient.

    Returns a function with the same (state, _) -> (state, History)
    signature as the single-device step.
    """
    import optax
    from jax import shard_map
    from ..training.engine import TrainState, History
    from ..training.losses import loss_fn

    n_dev = mesh.shape[axis]
    if cfg.train.n_train % n_dev:
        raise ValueError(f"n_train={cfg.train.n_train} not divisible by "
                         f"{n_dev} devices")
    n_local = cfg.train.n_train // n_dev
    resample_cutoff = int(cfg.train.resample_frac * cfg.train.epochs)
    every = cfg.train.resample_every

    def psum(v):
        return jax.lax.psum(v, axis)

    def device_step(state: TrainState):
        idx = jax.lax.axis_index(axis)
        key, sub = jax.random.split(state.key)
        sub = jax.random.fold_in(sub, idx)
        do_resample = jnp.logical_and(state.step % every == 0,
                                      state.step < resample_cutoff)
        batch = jax.lax.cond(do_resample,
                             lambda k: sample_batch(k, cfg, n=n_local),
                             lambda k: state.batch, sub)

        def share_of_global_loss(params):
            l_tot, aux = loss_fn(params, cfg, batch, allreduce=psum)
            return l_tot / n_dev, aux

        (l_share, aux), g_share = jax.value_and_grad(
            share_of_global_loss, has_aux=True)(state.params)
        l_tot = psum(l_share)       # == the replicated global loss
        grads = psum(g_share)       # == the exact global gradient
        # E of the GLOBAL last batch point (the reference's history E_h[tt] =
        # E[-1]): select the last device's local last point and replicate.
        e_last = psum(jnp.where(idx == n_dev - 1, aux.e_last, 0.0))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)
        improved = l_tot < state.best_loss
        best_params = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old),
            state.params, state.best_params)
        best_loss = jnp.where(improved, l_tot,
                              state.best_loss).astype(state.best_loss.dtype)
        d = cfg.train.ema_decay
        ema_params = jax.tree.map(lambda e_, p_: d * e_ + (1.0 - d) * p_,
                                  state.ema_params, new_params)
        new_state = TrainState(state.step + 1, new_params, opt_state, batch,
                               best_params, best_loss, ema_params, key)
        # aux.l_pde / aux.l_bc are already replicated global values (every
        # reduction inside loss_fn was psum'd)
        return new_state, History(l_tot, aux.l_pde, aux.l_bc, e_last)

    state_specs = TrainState(
        step=P(), params=P(), opt_state=P(),
        batch=Batch(*([P(axis)] * 6)),
        best_params=P(), best_loss=P(), ema_params=P(), key=P(),
    )

    sharded = shard_map(device_step, mesh=mesh,
                        in_specs=(state_specs,),
                        out_specs=(state_specs, History(P(), P(), P(), P())))

    def step(state: TrainState, _):
        return sharded(state)

    return step, n_local
