"""Guillemin-Zener envelope mode."""

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops import fwdlap, operators


def _pts(n=24, seed=3):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    return (jax.random.uniform(k[0], (n,), jnp.float64, -5, 5),
            jax.random.uniform(k[1], (n,), jnp.float64, -5, 5),
            jax.random.uniform(k[2], (n,), jnp.float64, -5, 5),
            jax.random.uniform(k[3], (n,), jnp.float64, 0.3, 3.5))


def test_gz_envelope_against_oracle():
    x, y, z, r = _pts()
    a, b = 1.2, 0.4
    c1 = (r, jnp.zeros_like(r), jnp.zeros_like(r))
    c2 = (-r, jnp.zeros_like(r), jnp.zeros_like(r))
    s = fwdlap.gz_envelope(x, y, z, c1, c2, a, b)

    def f(c, ri):
        r1 = jnp.linalg.norm(c - jnp.array([ri, 0.0, 0.0]))
        r2 = jnp.linalg.norm(c + jnp.array([ri, 0.0, 0.0]))
        return jnp.exp(-a * r1 - b * r2)

    lap = jax.vmap(lambda xx, yy, zz, rr: operators.laplacian_fn(
        lambda c: f(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(np.asarray(s.l[..., 0]), np.asarray(lap),
                               rtol=1e-10)


def test_gz_ansatz_matches_oracle_and_symmetry():
    cfg = pqs.Config(model=pqs.ModelConfig(gz=True, trainable_exponent=True),
                     dtype="float64")
    p = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    p["beta2"]["w"] = jax.random.normal(jax.random.PRNGKey(5), (8, 1),
                                        jnp.float64) * 0.2
    x, y, z, r = _pts()
    s, _ = ansatz.psi_fwdlap(p, cfg.model, x, y, z, r)
    pv, _ = ansatz.psi(p, cfg.model, x, y, z, r)
    np.testing.assert_allclose(np.asarray(s.v[..., 0]), np.asarray(pv),
                               rtol=1e-13)

    def point(c, ri):
        return ansatz.psi(p, cfg.model, c[0], c[1], c[2], ri)[0]

    lap = jax.vmap(lambda xx, yy, zz, rr: operators.laplacian_fn(
        lambda c: point(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(np.asarray(s.l[..., 0]), np.asarray(lap),
                               rtol=1e-9, atol=1e-12)
    pm, _ = ansatz.psi(p, cfg.model, -x, y, z, r)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pv), rtol=1e-13)


def test_ungerade_b_strictly_below_alpha():
    """P=-1: the physics part vanishes identically at b=a (exact psi=0
    collapse, observed in training) — the bound must keep b < a always."""
    cfg = pqs.Config(model=pqs.ModelConfig(gz=True, trainable_exponent=True,
                                           inversion_symmetry=-1),
                     dtype="float64")
    p = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    # push the head hard toward its upper bound
    p["beta2"]["b"] = jnp.asarray([50.0])
    r = jnp.linspace(0.2, 4.0, 64)
    a = ansatz.orbital_exponent(p, r)
    b = ansatz.gz_exponent(p, r, -1, a)
    assert np.all(np.asarray(b) < np.asarray(a) - 0.2)
    # and the antisymmetric physics part is nonzero off the mirror plane
    x = jnp.full((8,), 1.3)
    psi, _ = ansatz.psi(p, cfg.model, x, jnp.zeros(8), jnp.zeros(8),
                        jnp.linspace(0.5, 3.0, 8))
    assert float(jnp.min(jnp.abs(psi))) > 1e-4


def test_pure_gz_beats_lcao_at_equilibrium():
    """GZ with the classical (a, b) ~ (1.14, 0.22) at R=1 reaches ~0.1 mHa
    where LCAO is ~50 mHa off."""
    from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
    cfg = pqs.Config(model=pqs.ModelConfig(gz=True, trainable_exponent=True),
                     dtype="float64")
    p = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    for sub in ("out", "gate2"):
        p[sub]["w"] = jnp.zeros_like(p[sub]["w"])
        p[sub]["b"] = jnp.zeros_like(p[sub]["b"])
    p["alpha2"]["b"] = jnp.asarray([float(np.arctanh((1.14 - 1.5) / 0.75))])
    p["beta2"]["b"] = jnp.asarray([float(np.arctanh(0.22 / 0.75 - 1.0))])
    e = aen.rayleigh_quotient_adapted(p, cfg, 1.0, n=160)
    exact = aen.exact_energy([1.0])[0]
    assert abs(e - exact) < 5e-4   # < 0.5 mHa
