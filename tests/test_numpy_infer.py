"""Numpy-only inference replica vs the JAX forward (C13 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import numpy_infer
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz


@pytest.mark.parametrize("arch", ["symmetric", "minimal"])
def test_numpy_matches_jax(arch):
    cfg = (pqs.minimal_config(dtype="float64") if arch == "minimal"
           else pqs.Config(dtype="float64"))
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    np_params = jax.tree.map(np.asarray, params)
    rng = np.random.RandomState(0)
    x, y, z = (rng.uniform(-8, 8, 200) for _ in range(3))
    r = rng.uniform(0.3, 3.5, 200)

    psi_np = numpy_infer.psi(np_params, x, y, z, r, arch=arch,
                             inversion_symmetry=cfg.model.inversion_symmetry)
    psi_jx, e_jx = ansatz.psi(params, cfg.model, jnp.asarray(x),
                              jnp.asarray(y), jnp.asarray(z), jnp.asarray(r))
    np.testing.assert_allclose(psi_np, np.asarray(psi_jx), rtol=1e-12)

    e_np = numpy_infer.energy(np_params, r)
    np.testing.assert_allclose(e_np, np.asarray(e_jx), rtol=1e-12)

    g_np = numpy_infer.gate(np_params, r)
    g_jx = ansatz.gate(params, jnp.asarray(r))
    np.testing.assert_allclose(g_np, np.asarray(g_jx), rtol=1e-12)


@pytest.mark.parametrize("p_sym", [1, -1])
def test_numpy_matches_jax_flagship_gz(p_sym):
    """Ungerade bias skip + alpha/GZ heads (flagship model) in pure numpy."""
    import dataclasses
    cfg = pqs.Config(dtype="float64")
    mcfg = dataclasses.replace(cfg.model, inversion_symmetry=p_sym,
                               trainable_exponent=True, gz=True)
    params = ansatz.init_params(jax.random.PRNGKey(2), mcfg, jnp.float64)
    # perturb the zero-initialised head weights so alpha(R), b(R) vary
    params["alpha2"]["w"] = params["alpha2"]["w"] + 0.3
    params["beta2"]["w"] = params["beta2"]["w"] + 0.2
    np_params = jax.tree.map(np.asarray, params)
    rng = np.random.RandomState(1)
    x, y, z = (rng.uniform(-8, 8, 200) for _ in range(3))
    r = rng.uniform(0.3, 3.5, 200)
    psi_np = numpy_infer.psi(np_params, x, y, z, r, inversion_symmetry=p_sym)
    psi_jx, _ = ansatz.psi(params, mcfg, jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(z), jnp.asarray(r))
    # atol: the antisymmetric combination cancels to ~1e-17 near nodes where
    # different summation orders leave pure floating noise
    np.testing.assert_allclose(psi_np, np.asarray(psi_jx), rtol=1e-12,
                               atol=1e-15)
    np.testing.assert_allclose(
        numpy_infer.orbital_exponent(np_params, r),
        np.asarray(ansatz.orbital_exponent(params, jnp.asarray(r))),
        rtol=1e-12)
    alpha = numpy_infer.orbital_exponent(np_params, r)
    np.testing.assert_allclose(
        numpy_infer.gz_exponent(np_params, r, p_sym, alpha),
        np.asarray(ansatz.gz_exponent(params, jnp.asarray(r), p_sym,
                                      jnp.asarray(alpha))),
        rtol=1e-12)


def test_numpy_constants_match_ansatz():
    assert numpy_infer._ALPHA_MID == ansatz._ALPHA_MID
    assert numpy_infer._ALPHA_HALF == ansatz._ALPHA_HALF
    assert numpy_infer._BETA_HALF == ansatz._BETA_HALF


def test_numpy_ungerade_is_antisymmetric():
    import dataclasses
    cfg = pqs.Config(dtype="float64")
    mcfg = dataclasses.replace(cfg.model, inversion_symmetry=-1)
    params = ansatz.init_params(jax.random.PRNGKey(3), cfg.model, jnp.float64)
    np_params = jax.tree.map(np.asarray, params)
    rng = np.random.RandomState(2)
    x, y, z = (rng.uniform(-6, 6, 100) for _ in range(3))
    r = rng.uniform(0.3, 3.5, 100)
    del mcfg
    plus = numpy_infer.psi(np_params, x, y, z, r, inversion_symmetry=-1)
    minus = numpy_infer.psi(np_params, -x, -y, -z, r, inversion_symmetry=-1)
    np.testing.assert_allclose(plus, -minus, rtol=1e-12, atol=1e-300)


def test_numpy_reads_reference_modelbin(tmp_path):
    """model.bin -> numpy inference, the reference's energy.py workflow."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import modelbin
    cfg = pqs.minimal_config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(1), cfg.model, jnp.float64)
    path = str(tmp_path / "model.bin")
    modelbin.save_params(path, jax.tree.map(np.asarray, params))
    loaded = modelbin.load_params(path)
    r = np.linspace(0.2, 4.0, 50)
    np.testing.assert_allclose(numpy_infer.energy(loaded, r),
                               np.asarray(ansatz.energy(params,
                                                        jnp.asarray(r))),
                               rtol=1e-12)
