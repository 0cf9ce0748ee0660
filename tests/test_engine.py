"""Training engine: loss goes down, best tracking, freezing, resume."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine


def _cfg(**kw):
    return pqs.smoke_config(dtype="float64").replace(**kw)


def test_smoke_training_reduces_loss():
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=60, n_train=1024))
    res = engine.train(cfg)
    h = res.history["Ltot"]
    assert len(h) == 60
    assert h[-1] < h[0]
    assert res.best_loss <= np.min(h) + 1e-12
    assert np.isfinite(res.history["Energy"]).all()


def test_best_params_track_lowest_loss():
    cfg = _cfg()
    res = engine.train(cfg)
    # loss of best_params on any batch cannot be worse than the recorded best
    assert res.best_loss == np.min(res.history["Ltot"])


def test_finetune_freezes_base_and_gate():
    cfg = _cfg()
    res = engine.train(cfg)
    cfg2 = pqs.finetune_config(cfg)
    cfg2 = dataclasses.replace(
        cfg2, train=dataclasses.replace(cfg2.train, epochs=10, n_train=512,
                                        scan_chunk=5))
    res2 = engine.finetune(cfg2, params=res.params)
    for k in engine.FINETUNE_FROZEN:
        np.testing.assert_array_equal(res.params[k]["w"], res2.params[k]["w"])
        np.testing.assert_array_equal(res.params[k]["b"], res2.params[k]["b"])
    changed = any(
        not np.array_equal(res.params[k]["w"], res2.params[k]["w"])
        for k in ("e1", "e2", "eout"))
    assert changed


def test_checkpoint_resume_roundtrip(tmp_path):
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import checkpoint
    cfg = _cfg()
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(engine.make_step(cfg, opt))
    for _ in range(3):
        state, _ = step(state, None)
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, {"params": state.params, "opt": state.opt_state},
                    meta={"step": int(state.step)})
    tree, meta = checkpoint.load(
        path, {"params": state.params, "opt": state.opt_state})
    assert meta["step"] == 3
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        {"params": state.params, "opt": state.opt_state}, tree)


def test_resample_schedule_freezes_points():
    """After resample_frac * epochs the batch must stop changing."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=10, n_train=64,
                                       resample_frac=0.5, scan_chunk=1))
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(engine.make_step(cfg, opt))
    xs = []
    for _ in range(10):
        state, _ = step(state, None)
        xs.append(np.asarray(state.batch.x))
    assert not np.array_equal(xs[0], xs[1])      # resampling early
    for t in range(5, 9):
        np.testing.assert_array_equal(xs[t], xs[t + 1])  # frozen late


def test_resume_runs_only_remaining_steps():
    """epochs is the TOTAL schedule: resuming from step s runs epochs - s
    more steps, and a finished run resumes to zero steps (no frozen-batch
    overfit re-run)."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=20, n_train=256,
                                       scan_chunk=7))
    res = engine.train(cfg)
    assert len(res.history["Ltot"]) == 20
    resumed = engine.train(cfg, params=res.params, start_step=15)
    assert len(resumed.history["Ltot"]) == 5
    assert int(resumed.state.step) == 20
    done = engine.train(cfg, params=res.params, start_step=20)
    assert len(done.history["Ltot"]) == 0
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), done.params, res.params)


def test_eout_bias_init():
    cfg = pqs.Config()
    p = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    assert float(p["eout"]["b"][0]) == -1.0
