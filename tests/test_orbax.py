"""Optional Orbax checkpoint path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from pinn_for_quantum_wavefunction_surfaces_tpu.io import orbax_ckpt
    p = ansatz.init_params(jax.random.PRNGKey(0), pqs.Config().model,
                           jnp.float32)
    path = str(tmp_path / "ck")
    orbax_ckpt.save(path, p, meta={"step": 7})
    q, meta = orbax_ckpt.load(path, p)
    assert meta == {"step": 7}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p, q)
