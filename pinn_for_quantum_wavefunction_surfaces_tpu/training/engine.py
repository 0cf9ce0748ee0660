"""Training engine: jit-compiled `lax.scan` epoch loop with collocation
resampling, in-scan best-model tracking and freeze-aware optimisation.

TPU-first rewrite of the reference's Python epoch loops
(``poc/main.py:359-430``, ``train.py:21-72``):

- the whole epoch is ONE compiled step inside `lax.scan` — resampling,
  fused forward-Laplacian loss, Adam update and best-param tracking all run
  on-device with static shapes; the host only touches data at chunk
  boundaries (logging / checkpoint persistence);
- resampling is a `lax.cond` on the step counter, reproducing the reference
  schedule: every ``resample_every`` steps while ``step < resample_frac *
  epochs`` (poc/main.py:396 — the final 10% trains on a frozen point set,
  which is what makes best-checkpoint selection meaningful);
- freezing for the fine-tune stage uses ``optax.multi_transform`` with
  ``set_to_zero`` on the frozen subtrees — the functional replacement for
  ``requires_grad=False`` (reference poc/main.py:305-319);
- best-model policies: the in-carry snapshot keeps the params with the lowest
  loss seen at ANY step (reference train.py:58-60); disk persistence is gated
  to ``step > best_after_frac * epochs`` (reference poc/main.py:414-417).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import ansatz
from ..ops.sampling import Batch, sample_batch
from .losses import loss_fn

# Frozen subtrees for the fine-tune stage: freezeBase() + freezeDecayUnit()
# (reference poc/main.py:305-319) — only the E head (e1, e2, eout) trains.
FINETUNE_FROZEN = frozenset({"h1", "h2", "out", "gate1", "gate2"})


class TrainState(NamedTuple):
    step: jax.Array
    params: dict
    opt_state: optax.OptState
    batch: Batch
    best_params: dict
    best_loss: jax.Array
    ema_params: dict
    key: jax.Array


class History(NamedTuple):
    l_tot: jax.Array
    l_pde: jax.Array
    l_bc: jax.Array
    energy: jax.Array  # E of last batch point per step (reference E_h)


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    params: dict           # final params
    best_params: dict      # lowest-loss params seen
    best_loss: float
    history: dict          # {"Ltot", "Lpde", "Lbc", "Energy"} (reference keys)
    runtime_s: float
    points_per_sec: float
    ema_params: dict = None  # Polyak average (== final params if ema off)


def make_optimizer(cfg: Config, frozen: frozenset = frozenset(),
                   params_template: Optional[dict] = None):
    """Adam (reference lr/betas/eps) with optional frozen top-level subtrees
    and optional step-decay LR schedule (see TrainConfig.lr_schedule)."""
    t = cfg.train
    if t.lr_schedule == "step":
        lr = optax.exponential_decay(t.lr, transition_steps=t.sc_step,
                                     decay_rate=t.sc_decay, staircase=True)
    else:
        lr = t.lr
    adam = optax.adam(lr, b1=t.betas[0], b2=t.betas[1], eps=t.eps)
    if not frozen:
        return adam
    def labels(params):
        return {k: jax.tree.map(lambda _: "frozen" if k in frozen else "train",
                                v) for k, v in params.items()}
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels)


def init_state(key: jax.Array, cfg: Config, optimizer,
               params: Optional[dict] = None,
               opt_state: Optional[optax.OptState] = None,
               step: int = 0) -> TrainState:
    kp, kb, kc = jax.random.split(key, 3)
    if params is None:
        params = ansatz.init_params(kp, cfg.model, jnp.dtype(cfg.dtype))
    batch = sample_batch(kb, cfg)
    # best_loss carries the loss dtype (at least f32 so the running min is
    # meaningful even in bf16 compute mode)
    loss_dtype = jnp.promote_types(jnp.dtype(cfg.dtype), jnp.float32)
    big = jnp.asarray(jnp.inf, loss_dtype)
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        opt_state=optimizer.init(params) if opt_state is None else opt_state,
        batch=batch,
        best_params=params,
        best_loss=big,
        ema_params=params,
        key=kc,
    )


def make_step(cfg: Config, optimizer, mesh=None, axis: str = "data") -> Callable:
    """One compiled training step: (state, None) -> (state, history_row).

    With ``mesh``, the freshly sampled batch is pinned to the data axis via a
    sharding constraint — XLA (GSPMD) then shards the fused residual over
    devices and inserts the all-reduces for the global means.
    """
    resample_cutoff = int(cfg.train.resample_frac * cfg.train.epochs)
    every = cfg.train.resample_every

    def step(state: TrainState, _):
        key, sub = jax.random.split(state.key)
        do_resample = jnp.logical_and(state.step % every == 0,
                                      state.step < resample_cutoff)
        batch = jax.lax.cond(do_resample,
                             lambda k: sample_batch(k, cfg),
                             lambda k: state.batch, sub)
        if mesh is not None:
            from ..parallel.mesh import constrain_batch
            batch = constrain_batch(batch, mesh, axis)
        (l_tot, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cfg, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        new_params = optax.apply_updates(state.params, updates)
        improved = l_tot < state.best_loss
        best_params = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old),
            state.params, state.best_params)
        best_loss = jnp.where(improved, l_tot, state.best_loss)
        d = cfg.train.ema_decay
        ema_params = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                  state.ema_params, new_params)
        new_state = TrainState(state.step + 1, new_params, opt_state, batch,
                               best_params,
                               best_loss.astype(state.best_loss.dtype),
                               ema_params, key)
        return new_state, History(l_tot, aux.l_pde, aux.l_bc, aux.e_last)

    return step


def train(cfg: Config,
          key: Optional[jax.Array] = None,
          params: Optional[dict] = None,
          opt_state: Optional[optax.OptState] = None,
          start_step: int = 0,
          frozen: frozenset = frozenset(),
          checkpoint_cb: Optional[Callable[[TrainState, int], None]] = None,
          log_cb: Optional[Callable[[int, dict], None]] = None,
          mesh=None) -> TrainResult:
    """Run the full training schedule.

    The loop is chunked: ``scan_chunk`` steps run as one jitted `lax.scan`,
    then control returns to the host for logging and best-model persistence
    (the poc policy, reference poc/main.py:414-417). Pass ``mesh`` to shard
    the collocation batch across devices (see parallel/mesh.py).

    ``cfg.train.epochs`` is the TOTAL schedule length: resuming with
    ``start_step = s`` runs the remaining ``epochs - s`` steps, so the
    resample cutoff (absolute ``state.step``), the best-persist gate and the
    step counter persisted in checkpoint metadata all share one absolute
    counter. (A resumed finished run trains zero further steps instead of
    re-running the whole schedule on a frozen batch.)
    """
    t = cfg.train
    key = jax.random.PRNGKey(t.seed) if key is None else key
    optimizer = make_optimizer(cfg, frozen)
    state = init_state(key, cfg, optimizer, params, opt_state, start_step)
    if mesh is not None:
        from ..parallel.mesh import shard_state
        state = shard_state(state, mesh)
    step = make_step(cfg, optimizer, mesh=mesh)

    def run_chunk(state, n):
        return jax.lax.scan(step, state, None, length=n)

    run_chunk = jax.jit(run_chunk, static_argnums=1)

    chunks = []
    n_done = start_step  # absolute step counter (== state.step on device)
    persist_after = int(t.best_after_frac * t.epochs)
    last_persisted_best = np.inf
    t0 = time.perf_counter()
    while n_done < t.epochs:
        n = min(t.scan_chunk, t.epochs - n_done)
        state, hist = run_chunk(state, n)
        n_done += n
        chunks.append(jax.tree.map(np.asarray, hist))
        best = float(state.best_loss)
        if log_cb is not None:
            log_cb(n_done, {
                "Ltot": float(chunks[-1].l_tot[-1]),
                "Lpde": float(chunks[-1].l_pde[-1]),
                "Lbc": float(chunks[-1].l_bc[-1]),
                "E": float(chunks[-1].energy[-1]),
                "best": best,
            })
        if (checkpoint_cb is not None and n_done > persist_after
                and best < last_persisted_best):
            checkpoint_cb(state, n_done)
            last_persisted_best = best
    jax.block_until_ready(state.params)
    runtime = time.perf_counter() - t0
    steps_run = n_done - start_step
    cat = (lambda xs: np.concatenate(xs) if xs
           else np.zeros((0,), np.float32))
    history = {
        "Ltot": cat([c.l_tot for c in chunks]),
        "Lpde": cat([c.l_pde for c in chunks]),
        "Lbc": cat([c.l_bc for c in chunks]),
        "Energy": cat([c.energy for c in chunks]),
    }
    return TrainResult(
        state=state,
        params=jax.tree.map(np.asarray, state.params),
        best_params=jax.tree.map(np.asarray, state.best_params),
        best_loss=float(state.best_loss),
        history=history,
        runtime_s=runtime,
        points_per_sec=steps_run * t.n_train / max(runtime, 1e-9),
        ema_params=jax.tree.map(np.asarray, state.ema_params),
    )


def finetune(cfg: Config, params: dict, **kw) -> TrainResult:
    """Stage-2 schedule: freeze the wavefunction sub-networks and train only
    the E(R) head (reference poc/main.py:930-942: lr 5e-4, 2000 epochs).
    The trainable-exponent head (if present) belongs to the wavefunction and
    is frozen too."""
    # everything that is not the E head belongs to the wavefunction — this
    # also covers the separable arch's lam/mu/alpha/beta subtrees
    frozen = frozenset(k for k in params if k not in ("e1", "e2", "eout"))
    return train(cfg, params=params, frozen=frozen, **kw)
