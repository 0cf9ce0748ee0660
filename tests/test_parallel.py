"""Multi-device equivalence on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import mesh as pmesh
from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine, losses
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import sample_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _cfg():
    cfg = pqs.smoke_config(dtype="float64")
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_train=2048, epochs=8,
                                       scan_chunk=4))


def test_pjit_loss_matches_single_device():
    """Global-view (GSPMD) loss on a sharded batch == single-device loss."""
    cfg = _cfg()
    params = engine.init_state(jax.random.PRNGKey(0),
                               cfg, engine.make_optimizer(cfg)).params
    batch = sample_batch(jax.random.PRNGKey(1), cfg, n=2048)
    l_single, aux_single = jax.jit(losses.loss_fn, static_argnums=1)(
        params, cfg, batch)

    m = pmesh.make_mesh(8)
    sharded_batch = jax.device_put(batch, pmesh.batch_sharding(m))
    l_sharded, aux_sharded = jax.jit(losses.loss_fn, static_argnums=1)(
        params, cfg, sharded_batch)
    np.testing.assert_allclose(float(l_single), float(l_sharded), rtol=1e-12)
    np.testing.assert_allclose(float(aux_single.l_bc),
                               float(aux_sharded.l_bc), rtol=1e-12)


def test_pjit_training_matches_single_device():
    """Full chunked training with a mesh == without, to fp tolerance."""
    cfg = _cfg()
    r1 = engine.train(cfg)
    r2 = engine.train(cfg, mesh=pmesh.make_mesh(8))
    np.testing.assert_allclose(r1.history["Ltot"], r2.history["Ltot"],
                               rtol=1e-8)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-12),
        r1.params, r2.params)


def test_shardmap_step_runs_and_reduces():
    """Explicit shard_map step: finite loss, identical params across devices,
    loss decreases over a few steps."""
    cfg = _cfg()
    m = pmesh.make_mesh(8)
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
    step, n_local = pmesh.make_shardmap_step(cfg, opt, m)
    assert n_local == 2048 // 8
    state = pmesh.shard_state(state, m)
    step = jax.jit(step)
    hist = []
    for _ in range(8):
        state, h = step(state, None)
        hist.append(float(h.l_tot))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_shardmap_matches_pjit_gradients():
    """One shard_map step and one pjit step from identical state+batch give
    the same loss and the same updated params."""
    cfg = _cfg()
    m = pmesh.make_mesh(8)
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)

    # evaluate both on the SAME fixed batch: disable resampling via step>=cutoff
    cfg_frozen = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resample_frac=0.0))
    state = state._replace(step=jnp.ones((), jnp.int32))

    single = jax.jit(engine.make_step(cfg_frozen, opt))
    s1, h1 = single(state, None)

    sm_step, _ = pmesh.make_shardmap_step(cfg_frozen, opt, m)
    state_sh = pmesh.shard_state(state, m)
    s2, h2 = jax.jit(sm_step)(state_sh, None)

    np.testing.assert_allclose(float(h1.l_tot), float(h2.l_tot), rtol=1e-10)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-14),
        s1.params, s2.params)


@pytest.mark.parametrize("mode", ["scale_invariant", "lcao_weight",
                                  "correction_reg", "all"])
def test_shardmap_full_loss_modes_match_single_device(mode):
    """Every loss mode (global-normaliser ones included) on the explicit
    shard_map path == the single-device step, from identical state+batch."""
    cfg = _cfg()
    tr = dict(resample_frac=0.0)
    if mode in ("scale_invariant", "all"):
        tr["scale_invariant"] = True
    if mode in ("lcao_weight", "all"):
        tr["residual_weight"] = "lcao"
    if mode in ("correction_reg", "all"):
        tr["correction_reg"] = 0.1
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, **tr))
    m = pmesh.make_mesh(8)
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
    state = state._replace(step=jnp.ones((), jnp.int32))  # frozen batch

    single = jax.jit(engine.make_step(cfg, opt))
    s1, h1 = single(state, None)

    sm_step, _ = pmesh.make_shardmap_step(cfg, opt, m)
    s2, h2 = jax.jit(sm_step)(pmesh.shard_state(state, m), None)

    np.testing.assert_allclose(float(h1.l_tot), float(h2.l_tot), rtol=1e-10)
    np.testing.assert_allclose(float(h1.l_pde), float(h2.l_pde), rtol=1e-10)
    np.testing.assert_allclose(float(h1.l_bc), float(h2.l_bc), rtol=1e-10)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-14),
        s1.params, s2.params)


def test_shardmap_e_last_is_global_last_point():
    """History.energy must be E of the GLOBAL last batch point — identical to
    the single-device history, not some undefined per-device value."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resample_frac=0.0))
    m = pmesh.make_mesh(8)
    opt = engine.make_optimizer(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), cfg, opt)
    state = state._replace(step=jnp.ones((), jnp.int32))
    sm_step, _ = pmesh.make_shardmap_step(cfg, opt, m)
    s2, h2 = jax.jit(sm_step)(pmesh.shard_state(state, m), None)
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    e_expected = float(ansatz.energy(state.params,
                                     state.batch.r[-1:])[0])
    np.testing.assert_allclose(float(h2.energy), e_expected, rtol=1e-12)


def test_sharded_spheroidal_polish_matches_single_device():
    """The deterministic quotient objective shards over the R axis (each
    row's quadrature sums reduce within a shard); polish_spheroidal(mesh=..)
    must reproduce the single-device polish to fp-reduction tolerance."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational
    cfg = pqs.Config(dtype="float64",
                     model=pqs.ModelConfig(arch="separable"))
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model,
                                jnp.float64)
    # smoke sizes: equivalence is shape-independent and the L-BFGS mesh
    # executable dominates suite wall time (was 152 s at 16x12/6+4)
    kw = dict(n_r=8, n_xi=10, n_eta=8, steps=3, adam_steps=2)
    ref = variational.polish_spheroidal(params, cfg, **kw)
    m = pmesh.make_mesh(8)
    got = variational.polish_spheroidal(params, cfg, mesh=m, **kw)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12), ref, got)
