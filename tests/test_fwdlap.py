"""Forward-Laplacian propagation vs closed forms and the nested-AD oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops import fwdlap, operators


def _points(n=64, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.uniform(k[0], (n,), jnp.float64, -5, 5)
    y = jax.random.uniform(k[1], (n,), jnp.float64, -5, 5)
    z = jax.random.uniform(k[2], (n,), jnp.float64, -5, 5)
    r = jax.random.uniform(k[3], (n,), jnp.float64, 0.2, 4.0)
    return x, y, z, r


def test_envelope_laplacian_closed_form():
    # lap e^{-r} = (1 - 2/r) e^{-r}
    x, y, z, _ = _points()
    s = fwdlap.orbital_envelope(x, y, z, 0.0, 0.0, 0.0)
    r = jnp.sqrt(x * x + y * y + z * z)
    np.testing.assert_allclose(s.l[..., 0], (1 - 2 / r) * jnp.exp(-r),
                               rtol=1e-12)
    # grad e^{-r} = -e^{-r} * (x,y,z)/r
    expect = -jnp.exp(-r) / r
    np.testing.assert_allclose(s.g[..., 0, 0], expect * x, rtol=1e-12)
    np.testing.assert_allclose(s.g[..., 2, 0], expect * z, rtol=1e-12)


def test_product_rule_cross_term():
    # lap(f*g) for f=e^{-r1}, g=e^{-r2} must include 2 grad.grad
    x, y, z, r = _points()
    a = fwdlap.orbital_envelope(x, y, z, r, 0.0, 0.0)
    b = fwdlap.orbital_envelope(x, y, z, -r, 0.0, 0.0)
    prod = fwdlap.mul(a, b)

    def f(c, ri):
        r1 = jnp.linalg.norm(c - jnp.array([ri, 0.0, 0.0]))
        r2 = jnp.linalg.norm(c + jnp.array([ri, 0.0, 0.0]))
        return jnp.exp(-r1) * jnp.exp(-r2)

    lap = jax.vmap(lambda xx, yy, zz, rr: operators.laplacian_fn(
        lambda c: f(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(prod.l[..., 0], lap, rtol=1e-10)


@pytest.mark.parametrize("arch,p", [("symmetric", 1), ("symmetric", -1),
                                    ("minimal", 1)])
def test_ansatz_fwdlap_matches_nested_ad(arch, p):
    cfg = pqs.Config(model=pqs.ModelConfig(arch=arch, inversion_symmetry=p),
                     dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(1), cfg.model, jnp.float64)
    x, y, z, r = _points(32)
    s, e = ansatz.psi_fwdlap(params, cfg.model, x, y, z, r)
    psi_v, e_v = ansatz.psi(params, cfg.model, x, y, z, r)
    np.testing.assert_allclose(s.v[..., 0], psi_v, rtol=1e-14)
    np.testing.assert_allclose(e, e_v, rtol=1e-14)

    def point(c, ri):
        pv, _ = ansatz.psi(params, cfg.model, c[0], c[1], c[2], ri)
        return pv

    lap = jax.vmap(lambda xx, yy, zz, rr: operators.laplacian_fn(
        lambda c: point(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(s.l[..., 0], lap, rtol=1e-9, atol=1e-12)
    grad = jax.vmap(lambda xx, yy, zz, rr: jax.grad(
        lambda c: point(c, rr))(jnp.stack([xx, yy, zz])))(x, y, z, r)
    np.testing.assert_allclose(s.g[..., 0], grad, rtol=1e-9, atol=1e-12)


def test_elementwise_rules():
    # sigmoid/tanh/exp rules vs autodiff on a random affine seed
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (3, 7), jnp.float64)

    def net(c, prim):
        return prim(c @ w)

    x, y, z, _ = _points(16)
    for fl_prim, fn in [(fwdlap.sigmoid, jax.nn.sigmoid),
                        (fwdlap.tanh, jnp.tanh), (fwdlap.exp, jnp.exp)]:
        c = jnp.stack([x, y, z], axis=-1)
        seed = fwdlap.Spatial(
            c @ w, jnp.broadcast_to(w[None], (16, 3, 7)), jnp.zeros((16, 7)))
        out = fl_prim(seed)
        for j in range(7):
            lap = jax.vmap(lambda ci: operators.laplacian_fn(
                lambda cc: net(cc, fn)[j])(ci))(c)
            np.testing.assert_allclose(out.l[:, j], lap, rtol=1e-9,
                                       atol=1e-12)


def test_symmetry_properties():
    # gerade: psi(x) == psi(-x) exactly; ungerade: antisymmetric up to the
    # Lin_out bias (the reference ansatz shares this caveat)
    x, y, z, r = _points(32)
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(3), cfg.model, jnp.float64)
    a, _ = ansatz.psi(params, cfg.model, x, y, z, r)
    b, _ = ansatz.psi(params, cfg.model, -x, y, z, r)
    np.testing.assert_allclose(a, b, rtol=1e-14)

    cfg_u = pqs.Config(model=pqs.ModelConfig(inversion_symmetry=-1),
                       dtype="float64")
    pu = ansatz.init_params(jax.random.PRNGKey(3), cfg_u.model, jnp.float64)
    pu["out"]["b"] = jnp.zeros_like(pu["out"]["b"])
    a, _ = ansatz.psi(pu, cfg_u.model, x, y, z, r)
    b, _ = ansatz.psi(pu, cfg_u.model, -x, y, z, r)
    np.testing.assert_allclose(a, -b, rtol=1e-12, atol=1e-14)
