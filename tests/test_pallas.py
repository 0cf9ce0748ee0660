"""Pallas fused psi+laplacian kernel vs the fwdlap reference (interpret
mode — compiled-mode equivalence is exercised on real TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.pallas_residual import \
    psi_lap_pallas


@pytest.mark.parametrize("p_sym", [1, -1])
def test_kernel_matches_fwdlap(p_sym):
    cfg = pqs.Config(model=pqs.ModelConfig(inversion_symmetry=p_sym))
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float32)
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    n = 1100  # not a multiple of the (8, 128) tile -> exercises padding
    x = jax.random.uniform(k[0], (n,), jnp.float32, -6, 6)
    y = jax.random.uniform(k[1], (n,), jnp.float32, -6, 6)
    z = jax.random.uniform(k[2], (n,), jnp.float32, -6, 6)
    r = jax.random.uniform(k[3], (n,), jnp.float32, 0.5, 3.0)
    # jit both sides (mcfg static): the eager interpret grid loop costs
    # ~15 s/call; jitted it lands in the persistent compile cache
    psi_p, lap_p = jax.jit(psi_lap_pallas, static_argnums=(1,),
                           static_argnames=("interpret",))(
        params, cfg.model, x, y, z, r, interpret=True)
    s, _ = jax.jit(ansatz.psi_fwdlap, static_argnums=(1,))(
        params, cfg.model, x, y, z, r)
    np.testing.assert_allclose(np.asarray(psi_p), np.asarray(s.v[..., 0]),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(lap_p), np.asarray(s.l[..., 0]),
                               atol=2e-6)


def test_kernel_rejects_minimal_arch():
    cfg = pqs.minimal_config()
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float32)
    x = jnp.ones((8,), jnp.float32)
    with pytest.raises(NotImplementedError):
        psi_lap_pallas(params, cfg.model, x, x, x, x, interpret=True)


def test_kernel_rejects_extended_models():
    """The kernel must not SILENTLY ignore alpha/GZ heads."""
    cfg = pqs.Config(model=pqs.ModelConfig(gz=True, trainable_exponent=True))
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float32)
    x = jnp.ones((8,), jnp.float32)
    with pytest.raises(NotImplementedError):
        psi_lap_pallas(params, cfg.model, x, x, x, x, interpret=True)
