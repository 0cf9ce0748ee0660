"""Local-energy-variance residual weighting."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops import operators
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import \
    sample_batch
from pinn_for_quantum_wavefunction_surfaces_tpu.training import losses


def _weighted_cfg():
    cfg = pqs.Config(dtype="float64")
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, residual_weight="lcao"))


def test_weighted_loss_matches_dense_computation():
    cfg = _weighted_cfg()
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    b = sample_batch(jax.random.PRNGKey(1), cfg, n=2048)
    l, aux = losses.loss_fn(params, cfg, b)

    s, e = ansatz.psi_fwdlap(params, cfg.model, b.x, b.y, b.z, b.r)
    res = operators.residual_poc(cfg.model, b.x, b.y, b.z, b.r, s.v[..., 0],
                                 s.l[..., 0], e)
    w = np.asarray(ansatz.lcao(cfg.model, b.x, b.y, b.z, b.r)) ** 2
    w = w / w.mean()
    f = cfg.train.residual_weight_floor
    expect = float(np.mean(np.asarray(res) ** 2 * (w + f) / (1 + f)))
    np.testing.assert_allclose(float(aux.l_pde), expect, rtol=1e-12)


def test_weighted_training_runs():
    cfg = _weighted_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_train=512, epochs=30,
                                       scan_chunk=15,
                                       residual_weight="lcao"))
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine
    res = engine.train(cfg)
    assert np.isfinite(res.history["Ltot"]).all()
    assert res.history["Ltot"][-1] < res.history["Ltot"][0]


def test_shardmap_supports_weighting():
    """The explicit shard_map path now runs the weighted loss (global
    normaliser psum'd) — full-mode equivalence is in test_parallel.py."""
    import pytest
    from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import mesh as pm
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    cfg = _weighted_cfg()
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine
    import numpy as np
    opt = engine.make_optimizer(cfg)
    step, _ = pm.make_shardmap_step(cfg, opt, pm.make_mesh(2))
    state = pm.shard_state(
        engine.init_state(jax.random.PRNGKey(0), cfg, opt), pm.make_mesh(2))
    _, h = jax.jit(step)(state, None)
    assert np.isfinite(float(h.l_tot))
