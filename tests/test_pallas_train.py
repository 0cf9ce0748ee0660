"""Pallas fused TRAINING kernel (custom VJP): values AND gradients vs the
XLA fwdlap path, flagship (alpha + GZ) models included. Runs in interpret
mode on CPU; compiled-mode equivalence/speed is measured by bench.py on the
real TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.pallas_train import \
    psi_lap_train
from pinn_for_quantum_wavefunction_surfaces_tpu.training import losses
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import \
    sample_batch


def _model(p_sym=1, gz=False, alpha=False, dtype=jnp.float64, seed=0,
           hidden=16):
    # hidden=4 for anything exercising the BACKWARD kernel: the unrolled
    # in-kernel VJP trace compiles in O(hidden^2) on CPU (minutes at 16,
    # seconds at 4); the math is width-independent
    mcfg = pqs.ModelConfig(inversion_symmetry=p_sym, gz=gz,
                           trainable_exponent=alpha, hidden=hidden)
    params = ansatz.init_params(jax.random.PRNGKey(seed), mcfg, dtype)
    if alpha:
        params["alpha2"]["w"] = params["alpha2"]["w"] + 0.3
    if gz:
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
# ~10 ms. Numerics are identical — the asserts are unchanged.
_VG_LOSS = jax.jit(jax.value_and_grad(losses.loss_fn, has_aux=True),
                   static_argnums=1)
_PSI_LAP = jax.jit(psi_lap_train, static_argnums=(1,),
                   static_argnames=("interpret", "point_grads"))
_FWDLAP = jax.jit(ansatz.psi_fwdlap, static_argnums=(1,))


@pytest.mark.parametrize("p_sym,gz,alpha", [
    (1, False, False), (-1, False, False),
    (1, True, True), (-1, True, True), (1, False, True),
])
def test_values_match_fwdlap(p_sym, gz, alpha):
    mcfg, params = _model(p_sym, gz, alpha)
    x, y, z, r = _points()
    psi_p, lap_p, e_p = _PSI_LAP(params, mcfg, x, y, z, r, interpret=True)
    s, e = _FWDLAP(params, mcfg, x, y, z, r)
    np.testing.assert_allclose(np.asarray(psi_p), np.asarray(s.v[..., 0]),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(lap_p), np.asarray(s.l[..., 0]),
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e), rtol=1e-14)


@pytest.mark.parametrize("p_sym,gz,alpha", [
    (1, False, False), (1, True, True), (-1, True, True),
])
def test_loss_gradients_match_xla(p_sym, gz, alpha):
    """Full loss gradient (params pytree) through the custom VJP == XLA
    autodiff, in float64 interpret mode to expose any analytic mistake."""
    mcfg, params = _model(p_sym, gz, alpha, hidden=4)
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


def test_point_cotangents_are_exact():
    """With point_grads=True the VJP covers the point coordinates too; the
    default fast path stop-gradients them (zero is then exact)."""
    mcfg, params = _model(1, True, True, hidden=4)
    x, y, z, r = _points(n=64)

    def f_pallas(x_):
        psi, lap, _ = psi_lap_train(params, mcfg, x_, y, z, r,
                                    interpret=True, point_grads=True)
        return jnp.sum(psi ** 2) + jnp.sum(lap)

    def f_xla(x_):
        s, _ = ansatz.psi_fwdlap(params, mcfg, x_, y, z, r)
        return jnp.sum(s.v[..., 0] ** 2) + jnp.sum(s.l[..., 0])

    gp = jax.jit(jax.grad(f_pallas))(x)
    gx = jax.jit(jax.grad(f_xla))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-8, atol=1e-12)


def test_training_step_with_pallas_kernel_reduces_loss():
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine
    cfg = pqs.smoke_config(dtype="float32")
    cfg = dataclasses.replace(
        cfg,
        model=pqs.ModelConfig(hidden=4),
        train=dataclasses.replace(cfg.train, kernel="pallas",
                                  epochs=6, n_train=256, scan_chunk=3))
    res = engine.train(cfg)
    h = res.history["Ltot"]
    assert np.isfinite(h).all()
    assert h[-1] < h[0]


def test_rejects_r_input_and_minimal():
    mcfg = pqs.ModelConfig(r_input=True)
    params = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    x = jnp.ones((8,), jnp.float64)
    with pytest.raises(NotImplementedError):
        psi_lap_train(params, mcfg, x, x, x, x, interpret=True)
    mcfg2 = pqs.minimal_config().model
    params2 = ansatz.init_params(jax.random.PRNGKey(0), mcfg2, jnp.float64)
    with pytest.raises(NotImplementedError):
        psi_lap_train(params2, mcfg2, x, x, x, x, interpret=True)
