"""Trainable orbital exponent alpha(R)."""

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops import operators


def _pts(n=24):
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    return (jax.random.uniform(k[0], (n,), jnp.float64, -5, 5),
            jax.random.uniform(k[1], (n,), jnp.float64, -5, 5),
            jax.random.uniform(k[2], (n,), jnp.float64, -5, 5),
            jax.random.uniform(k[3], (n,), jnp.float64, 0.3, 3.5))


def test_zero_init_is_identity():
    """With the zero-initialised head, psi equals the alpha-less model."""
    cfg = pqs.Config(model=pqs.ModelConfig(trainable_exponent=True),
                     dtype="float64")
    p = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    p0 = {k: v for k, v in p.items() if not k.startswith("alpha")}
    x, y, z, r = _pts()
    a, _ = ansatz.psi(p, cfg.model, x, y, z, r)
    b, _ = ansatz.psi(p0, pqs.Config(dtype="float64").model, x, y, z, r)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(ansatz.orbital_exponent(p, r)), 1.0)


def test_fwdlap_matches_oracle_with_alpha():
    cfg = pqs.Config(model=pqs.ModelConfig(trainable_exponent=True),
                     dtype="float64")
    p = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    p["alpha2"]["w"] = jax.random.normal(jax.random.PRNGKey(7), (8, 1),
                                         jnp.float64) * 0.1
    p["alpha2"]["b"] = jnp.asarray([0.2])
    x, y, z, r = _pts()
    s, _ = ansatz.psi_fwdlap(p, cfg.model, x, y, z, r)
    pv, _ = ansatz.psi(p, cfg.model, x, y, z, r)
    np.testing.assert_allclose(np.asarray(s.v[..., 0]), np.asarray(pv),
                               rtol=1e-14)

    def point(c, ri):
        return ansatz.psi(p, cfg.model, c[0], c[1], c[2], ri)[0]

    lap = jax.vmap(lambda xx, yy, zz, rr: operators.laplacian_fn(
        lambda c: point(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(np.asarray(s.l[..., 0]), np.asarray(lap),
                               rtol=1e-9, atol=1e-12)


def test_finetune_freezes_alpha():
    import dataclasses
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(
        cfg, model=pqs.ModelConfig(trainable_exponent=True))
    res = engine.train(cfg)
    cfg2 = pqs.finetune_config(cfg)
    cfg2 = dataclasses.replace(
        cfg2, train=dataclasses.replace(cfg2.train, epochs=6, n_train=256,
                                        scan_chunk=3))
    res2 = engine.finetune(cfg2, params=res.params)
    np.testing.assert_array_equal(res.params["alpha1"]["w"],
                                  res2.params["alpha1"]["w"])
    np.testing.assert_array_equal(res.params["alpha2"]["w"],
                                  res2.params["alpha2"]["w"])


def test_wide_alpha_head():
    import pytest
    """ModelConfig.wide_alpha: the (0.3, 2.25) "xalpha*" head — exactly 1
    at init, bounded at both edges, lower edge clear of the ungerade
    b < alpha - 0.25 bound, params-keyed (legacy alpha1 untouched)."""
    import jax.numpy as jnp
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    mcfg = pqs.ModelConfig(arch="separable", wide_alpha=True)
    p = ansatz.init_params(jax.random.PRNGKey(0), mcfg, jnp.float64)
    assert "xalpha1" in p and "alpha1" not in p
    r = jnp.asarray([0.2, 1.0, 4.0])
    np.testing.assert_allclose(np.asarray(ansatz.orbital_exponent(p, r)),
                               1.0, rtol=0, atol=1e-15)
    p["xalpha2"]["b"] = jnp.asarray([-50.0])
    lo = float(ansatz.orbital_exponent(p, r)[0])
    p["xalpha2"]["b"] = jnp.asarray([50.0])
    hi = float(ansatz.orbital_exponent(p, r)[0])
    assert abs(lo - 0.3) < 1e-9 and abs(hi - 2.25) < 1e-9
    assert lo > 0.25  # the ungerade b-bound stays positive
    with pytest.raises(ValueError):
        pqs.ModelConfig(arch="symmetric", wide_alpha=True)


def test_wide_alpha_numpy_infer_parity():
    import jax.numpy as jnp
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import \
        numpy_infer
    from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
    mcfg = pqs.ModelConfig(arch="separable", wide_alpha=True, m_abs=1)
    p = ansatz.init_params(jax.random.PRNGKey(2), mcfg, jnp.float64)
    for nm in ("lamout", "muout", "xalpha2", "beta2"):
        p[nm]["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(9),
                                             p[nm]["w"].shape, jnp.float64)
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    x, y, z = (jax.random.uniform(k[i], (32,), jnp.float64, -4, 4)
               for i in range(3))
    r = jax.random.uniform(k[3], (32,), jnp.float64, 0.2, 4.0)
    np_p = {kk: {n: np.asarray(v) for n, v in sub.items()}
            for kk, sub in p.items()}
    got = numpy_infer.psi(np_p, np.asarray(x), np.asarray(y),
                          np.asarray(z), np.asarray(r), arch="separable",
                          m_abs=1)
    want, _ = ansatz.psi(p, mcfg, x, y, z, r)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12)
