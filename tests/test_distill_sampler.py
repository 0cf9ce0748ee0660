"""E-head distillation, mixed importance sampler, adapted quadrature."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import pinn_for_quantum_wavefunction_surfaces_tpu as pqs
from pinn_for_quantum_wavefunction_surfaces_tpu.analysis import energy as aen
from pinn_for_quantum_wavefunction_surfaces_tpu.models import ansatz
from pinn_for_quantum_wavefunction_surfaces_tpu.ops import quadrature as q
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.operators import radial
from pinn_for_quantum_wavefunction_surfaces_tpu.ops.sampling import \
    sample_batch
from pinn_for_quantum_wavefunction_surfaces_tpu.training import distill


def test_adapted_axis_integrates_smooth_functions():
    x, w = q.adapted_axis(101, 8.0, (0.0,))
    np.testing.assert_allclose(w @ np.exp(-x ** 2), np.sqrt(np.pi),
                               rtol=1e-5)
    x, w = q.adapted_axis(121, 10.0, (-2.0, 2.0))
    np.testing.assert_allclose(w @ np.exp(-0.5 * x ** 2),
                               np.sqrt(2 * np.pi), rtol=1e-5)


def test_adapted_axis_beats_uniform_on_cusp():
    """integral of e^{-2|x-c|} with the cusp OFF any grid node (the generic
    situation for nuclei at runtime +-R): clustering at c must win."""
    L, n, c = 12.0, 80, 0.37
    f = lambda x: np.exp(-2 * np.abs(x - c))
    exact = (1 - np.exp(-2 * (L - c))) / 2 + (1 - np.exp(-2 * (L + c))) / 2
    xu = np.linspace(-L, L, n)
    wu = q.simpson_weights(n, xu[1] - xu[0])
    xa, wa = q.adapted_axis(n, L, (c,))
    assert abs(wa @ f(xa) - exact) < abs(wu @ f(xu) - exact) / 2


def test_adapted_quotient_matches_uniform_converged():
    """adapted n=80 ~ uniform n=320 for the LCAO Rayleigh quotient."""
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    ref = aen.rayleigh_quotient(params, cfg, 1.0, n=240, which="lcao")
    coarse_uniform = aen.rayleigh_quotient(params, cfg, 1.0, n=60,
                                           which="lcao")
    coarse_adapted = aen.rayleigh_quotient_adapted(params, cfg, 1.0, n=60,
                                                   which="lcao")
    assert abs(coarse_adapted - ref) < abs(coarse_uniform - ref)
    assert abs(coarse_adapted - ref) < 2e-3


def test_mixed_sampler_focuses_near_nuclei():
    cfg = pqs.Config(dtype="float32",
                     domain=pqs.DomainConfig(sampler="mixed"))
    b = sample_batch(jax.random.PRNGKey(0), cfg, n=20000)
    r1, r2 = radial(cfg.model, b.x, b.y, b.z, b.r)
    rmin = jnp.minimum(r1, r2)
    frac_near = float(jnp.mean(rmin < 3.0))
    assert frac_near > 0.1            # uniform gives ~0.004
    # the cusp shell stays excluded (focus_floor) up to the uniform tail's
    # tiny background probability
    assert float(jnp.mean(rmin < cfg.domain.focus_floor)) < 1e-3
    # boundary sets still populated by the uniform tail
    assert int(b.bc1.sum()) > 0 and int(b.bc2.sum()) > 0
    # everything inside the box
    assert float(jnp.max(jnp.abs(b.x))) <= cfg.domain.box + 1e-6
    # singularity clamp still enforced: recomputed radii respect masks
    np.testing.assert_array_equal(np.asarray(b.bc1),
                                  np.asarray(r1 >= cfg.domain.bc_cutoff))


def test_mixed_sampler_trains():
    cfg = pqs.smoke_config(dtype="float64")
    cfg = dataclasses.replace(
        cfg, domain=pqs.DomainConfig(sampler="mixed"),
        train=dataclasses.replace(cfg.train, epochs=40, n_train=1024,
                                  scan_chunk=20))
    from pinn_for_quantum_wavefunction_surfaces_tpu.training import engine
    res = engine.train(cfg)
    assert np.isfinite(res.history["Ltot"]).all()
    assert res.history["Ltot"][-1] < res.history["Ltot"][0]


def test_distill_fits_head_to_targets():
    cfg = pqs.Config(dtype="float64")
    params = ansatz.init_params(jax.random.PRNGKey(0), cfg.model, jnp.float64)
    r = np.linspace(0.3, 3.9, 40)
    targets = -0.6 - 0.5 * np.exp(-r)        # synthetic smooth surface
    new_params = distill.fit_energy_head(params, r, targets, steps=3000)
    e = np.asarray(ansatz.energy(new_params, jnp.asarray(r)))
    assert np.sqrt(np.mean((e - targets) ** 2)) < 2e-3
    # non-head subtrees untouched
    for k in ("h1", "h2", "out", "gate1", "gate2"):
        np.testing.assert_array_equal(np.asarray(params[k]["w"]),
                                      np.asarray(new_params[k]["w"]))
