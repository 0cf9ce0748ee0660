"""Mesh-sharded Rayleigh quotient == single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_sharded_matches_single_device():
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    m = pmesh.make_mesh(8)
    # n=30 is NOT divisible by 8 -> exercises the zero-weight padding
    e_single = aen.rayleigh_quotient(params, cfg, 2.0, n=30)
    e_sharded = aen.rayleigh_quotient_sharded(params, cfg, 2.0, m, n=30)
    np.testing.assert_allclose(e_sharded, e_single, rtol=1e-12)
    # LCAO path too
    l_single = aen.rayleigh_quotient(params, cfg, 1.0, n=32, which="lcao")
    l_sharded = aen.rayleigh_quotient_sharded(params, cfg, 1.0, m, n=32,
                                              which="lcao")
    np.testing.assert_allclose(l_sharded, l_single, rtol=1e-12)
