"""Pallas fused TRAINING kernel for the separable flagship family: values
AND gradients vs the XLA fwdlap path, both parities. Interpret mode on CPU;
compiled-mode speed is measured by bench.py --arch separable --kernel pallas
on the real TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.pallas_separable import \
    psi_lap_train_separable
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import \
    sample_batch
from pinn_for_quantum_wavefunction_surfaces_tpu.training import losses


def _model(p_sym=1, dtype=jnp.float64, seed=0, hidden=16):
    # hidden=4 for anything exercising the BACKWARD kernel: the in-kernel
    # VJP trace compiles in O(hidden^2) on CPU (the math is width-blind)
    mcfg = pqs.ModelConfig(arch="separable", inversion_symmetry=p_sym,
                           hidden=hidden)
    params = ansatz.init_params(jax.random.PRNGKey(seed), mcfg, dtype)
    # knock the zero-initialised output layers off zero so the MLP bodies
    # actually contribute (init is exactly the GZ ansatz otherwise)
    for k in ("lamout", "muout"):
        params[k]["w"] = params[k]["w"] + 0.15
        params[k]["b"] = params[k]["b"] + 0.05
    params["beta2"]["w"] = params["beta2"]["w"] + 0.2
    return mcfg, params


def _points(n=1100, dtype=jnp.float64, seed=1):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.uniform(k[0], (n,), dtype, -6, 6)
    y = jax.random.uniform(k[1], (n,), dtype, -6, 6)
    z = jax.random.uniform(k[2], (n,), dtype, -6, 6)
    r = jax.random.uniform(k[3], (n,), dtype, 0.5, 3.0)
    return x, y, z, r


# jit everything (cfg/mcfg static): EAGER interpret-mode kernels re-run
# their grid loop op-by-op on every call (~10-30 s each); under jit the
# executable lands in the persistent compile cache and warm reruns are
# ~10 ms. Numerics are identical — the asserts are unchanged. (Warnings
# from the fallback guard still fire: they are emitted at TRACE time,
# which happens once per process.)
_VG_LOSS = jax.jit(jax.value_and_grad(losses.loss_fn, has_aux=True),
                   static_argnums=1)
_LOSS = jax.jit(losses.loss_fn, static_argnums=1)
_PSI_LAP = jax.jit(psi_lap_train_separable, static_argnums=(1,),
                   static_argnames=("interpret", "point_grads"))
_FWDLAP = jax.jit(ansatz.psi_fwdlap, static_argnums=(1,))


@pytest.mark.parametrize("p_sym", [1, -1])
def test_values_match_fwdlap(p_sym):
    mcfg, params = _model(p_sym)
    x, y, z, r = _points()
    psi_p, lap_p, e_p = _PSI_LAP(params, mcfg, x, y, z, r, interpret=True)
    s, e = _FWDLAP(params, mcfg, x, y, z, r)
    np.testing.assert_allclose(np.asarray(psi_p), np.asarray(s.v[..., 0]),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(lap_p), np.asarray(s.l[..., 0]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e), rtol=1e-14)


@pytest.mark.parametrize("p_sym", [1, -1])
def test_loss_gradients_match_xla(p_sym):
    """Full residual-loss gradient (params pytree) through the custom VJP ==
    XLA autodiff, float64 interpret mode."""
    mcfg, params = _model(p_sym, hidden=4)
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(cfg, model=mcfg)
    batch = sample_batch(jax.random.PRNGKey(3), cfg, n=512)

    cfg_p = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, kernel="pallas"))
    (l_x, _), g_x = _VG_LOSS(params, cfg, batch)
    (l_p, _), g_p = _VG_LOSS(params, cfg_p, batch)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-11)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12),
        g_p, g_x)


def test_quotient_loss_gradients_match_xla():
    """The flagship recipe's variational objective through the kernel
    (training/variational.quotient_loss dispatch)."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    mcfg, params = _model(1, hidden=4)
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(cfg, model=mcfg)
    vb = variational.spheroidal_vbatch(cfg, n_r=3, n_xi=12, n_eta=8)

    cfg_p = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, kernel="pallas"))
    vg_quot = jax.jit(jax.value_and_grad(variational.quotient_loss,
                                         has_aux=True), static_argnums=1)
    (l_x, _), g_x = vg_quot(params, cfg, vb)
    (l_p, _), g_p = vg_quot(params, cfg_p, vb)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-11)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-11),
        g_p, g_x)


def test_point_cotangents_are_exact():
    mcfg, params = _model(1, hidden=4)
    x, y, z, r = _points(n=64)

    def f_pallas(x_):
        psi, lap, _ = psi_lap_train_separable(params, mcfg, x_, y, z, r,
                                              interpret=True,
                                              point_grads=True)
        return jnp.sum(psi ** 2) + jnp.sum(lap)

    def f_xla(x_):
        s, _ = ansatz.psi_fwdlap(params, mcfg, x_, y, z, r)
        return jnp.sum(s.v[..., 0] ** 2) + jnp.sum(s.l[..., 0])

    np.testing.assert_allclose(np.asarray(jax.jit(jax.grad(f_pallas))(x)),
                               np.asarray(jax.jit(jax.grad(f_xla))(x)),
                               rtol=1e-8, atol=1e-12)


def test_training_step_with_pallas_kernel_reduces_loss():
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine
    cfg = pqs.smoke_config(dtype="float32")
    cfg = dataclasses.replace(
        cfg,
        model=pqs.ModelConfig(arch="separable", hidden=4),
        train=dataclasses.replace(cfg.train, kernel="pallas",
                                  epochs=6, n_train=256, scan_chunk=3))
    res = engine.train(cfg)
    h = res.history["Ltot"]
    assert np.isfinite(h).all()
    assert h[-1] < h[0]


def test_rejects_non_separable_params():
    mcfg = pqs.ModelConfig()
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x = jnp.ones((8,), jnp.float64)
    with pytest.raises(NotImplementedError):
        psi_lap_train_separable(params, mcfg, x, x, x, x, interpret=True)


@pytest.mark.parametrize("family", ["m_abs", "xi_node"])
def test_uncovered_family_warns_and_falls_back_to_xla(family):
    """--kernel pallas on a family the kernels don't cover (pi/delta
    transverse factor, node factors) must WARN and fall back to the XLA
    fwdlap path — never silently substitute, never raise from inside the
    kernel. Both loss paths (losses.loss_fn, variational.quotient_loss)
    share the guard; the fallback losses must equal the XLA ones."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import \
        variational

    if family == "m_abs":
        mcfg = pqs.ModelConfig(arch="separable", hidden=4, m_abs=1)
    else:
        mcfg = pqs.ModelConfig(arch="separable", hidden=4, xi_node=True)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(cfg, model=mcfg)
    cfg_p = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, kernel="pallas"))

    assert losses.pallas_unsupported_reason(params, mcfg) is not None

    vb = variational.spheroidal_vbatch(cfg, n_r=2, n_xi=10, n_eta=6)
    jit_quot = jax.jit(variational.quotient_loss, static_argnums=1)
    with pytest.warns(UserWarning, match="falling back"):
        l_p, _ = jit_quot(params, cfg_p, vb)
    l_x, _ = jit_quot(params, cfg, vb)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=0, atol=0)

    batch = sample_batch(jax.random.PRNGKey(3), cfg, 64)
    with pytest.warns(UserWarning, match="falling back"):
        l_p, _ = _LOSS(params, cfg_p, batch)
    l_x, _ = _LOSS(params, cfg, batch)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=0, atol=0)
